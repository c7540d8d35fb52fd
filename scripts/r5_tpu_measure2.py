"""Round-5 W=80 decomposition probes: where do the remaining ~1360 ms go?

Per W=80 sweep at 1078 nodes (n_passes=2, chunk=8):
  - 135 grid_match calls (2 per window solve x 54 + 27 eval)
  - 1431 system() assemblies
  - 1296 dense [240, 240] linear solves (batched 8 at a time)

Probes:
  1. probe_match_capacity = exactly one grid_match per even-tiling window
     (14 windows, lax.map) -> per-window match cost.
  2. chained batched [8, 240, 240] LU vs Cholesky solve (fori_loop with data
     dependence, output consumed) -> per-batched-solve in-loop cost.
  3. match_rounds=1 and gn_iterations=6 A/Bs at the full sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_measure2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.models.enml.driver import EpisodeOptions, build_episodes
from hitl_slam_tpu.models.enml.localizer import EnmlOptions
from hitl_slam_tpu.models.enml.parallel_localizer import (
    checkerboard_localize, probe_match_capacity)
from hitl_slam_tpu.io.figure8 import generate_raw_stream


def force_fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    force_fetch(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        force_fetch(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ns = 2600
    scans_l, angles_l, rel_l, _, _ = generate_raw_stream(
        num_steps=ns, num_rays=240, seed=12, num_laps=7)
    lp, lpcs, lncs, _ = build_episodes(
        scans_l, angles_l, rel_l, EpisodeOptions(clip_low=10, clip_high=10))
    est = make_map_state(lp, np.zeros((len(lp), 3, 3), np.float32), lpcs, lncs)
    P = est.num_poses
    print(f"nodes={P}", flush=True)
    w80 = EnmlOptions(max_history=80)

    # --- probe 1: per-window grid match (14 windows, one match each) ---
    t = timeit(probe_match_capacity, est.points, est.normals, est.point_mask,
               est.poses, w80)
    print(f"probe_match x14 windows: {t:.1f} ms -> {t / 14:.2f} ms/match; "
          f"sweep share (135 matches): {t / 14 * 135:.0f} ms", flush=True)

    # --- probe 2: chained batched dense solves [8, 240, 240] ---
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(8, 240, 240)).astype(np.float32))
    Aspd = A @ jnp.swapaxes(A, -1, -2) + 240.0 * jnp.eye(240)
    bvec = jnp.asarray(rng.normal(size=(8, 240)).astype(np.float32))
    REP = 64

    @jax.jit
    def chain_lu(Aspd, b):
        def body(_, carry):
            x = jnp.linalg.solve(Aspd, carry[..., None])[..., 0]
            return x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
        return jax.lax.fori_loop(0, REP, body, b)

    @jax.jit
    def chain_chol(Aspd, b):
        def body(_, carry):
            L = jnp.linalg.cholesky(Aspd)
            x = jax.scipy.linalg.cho_solve((L, True), carry[..., None])[..., 0]
            return x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-30)
        return jax.lax.fori_loop(0, REP, body, b)

    for name, fn in (("LU", chain_lu), ("Cholesky", chain_chol)):
        t = timeit(fn, Aspd, bvec)
        per = t / REP
        print(f"batched [8,240,240] {name}: {per:.3f} ms/solve-batch; "
              f"sweep share (162 batches): {per * 162:.0f} ms", flush=True)

    # --- probe 3: sweep-level A/Bs ---
    base = dict(chunk=8)
    for label, opts in (
        ("w80 full (mr=2, gn=12)", w80),
        ("w80 match_rounds=1", EnmlOptions(max_history=80, match_rounds=1)),
        ("w80 gn=6", EnmlOptions(max_history=80, gn_iterations=6)),
        ("w80 gn=6 mr=1", EnmlOptions(max_history=80, gn_iterations=6,
                                      match_rounds=1)),
    ):
        t = timeit(lambda o: checkerboard_localize(
            est.points, est.normals, est.point_mask, est.poses, o, **base),
            opts, n=2)
        print(f"{label}: {t:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
