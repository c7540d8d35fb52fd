"""Scoped host timing utilities.

Analog of the reference's shared/util timing layer (timer.h:31-150
Timer/AccumulativeTimer/FunctionTimer with per-line Lap) rebuilt for a
JAX host loop: wall-clock laps plus a process-wide accumulator registry, and
a helper to wrap jax.profiler traces around device work.
"""

from __future__ import annotations

import collections
import contextlib
import time


class FunctionTimer:
    """Named lap timer: ft = FunctionTimer('x'); ...; ft.lap('stage')."""

    def __init__(self, name: str):
        self.name = name
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.laps: list[tuple[str, float]] = []

    def lap(self, label: str) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.laps.append((label, dt))
        return dt

    def total(self) -> float:
        return time.perf_counter() - self.t0

    def laps_ms(self) -> dict:
        return {k: v * 1e3 for k, v in self.laps}


class TimerCollection:
    """Process-wide (label -> accumulated seconds, count) registry, like the
    reference's AlgorithmTimer/TimerCollection (algorithm_timer.h:28-40)."""

    def __init__(self):
        self.acc = collections.defaultdict(float)
        self.count = collections.defaultdict(int)

    @contextlib.contextmanager
    def time(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[label] += time.perf_counter() - t0
            self.count[label] += 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.acc):
            n = self.count[k]
            lines.append(
                f"{k}: total {self.acc[k]*1e3:.2f} ms over {n} "
                f"({self.acc[k]/max(n,1)*1e3:.3f} ms avg)"
            )
        return "\n".join(lines)


GLOBAL_TIMERS = TimerCollection()


@contextlib.contextmanager
def device_trace(label: str, enabled: bool = False, logdir: str = "/tmp/jax-trace"):
    """Optionally wrap a block in a jax.profiler trace (TPU timeline)."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        with jax.profiler.TraceAnnotation(label):
            yield


def install_crash_guard():
    """Native-crash backtrace guard for CLI entry points (the reference
    installs a SIGSEGV/SIGABRT handler, HitLSLAM_main.cpp:948-951 /
    shared/util/helpers.h:40-44): Python tracebacks are free, but a crash
    inside a ctypes call (native stfs parser / bag scanner / liblz4) would
    otherwise die silently."""
    import faulthandler

    try:
        faulthandler.enable()
    except Exception:
        pass    # no real stderr fd (e.g. captured streams) — skip the guard
