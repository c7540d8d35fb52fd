"""Round-5 re-measure after the three W=80 optimizations (structured
assembly, Cholesky window solve, need_hessian skip, dense tridiagonal
placement): w80 checkerboard at the bench's 1078-node shapes + consistency.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_measure3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import numpy as np

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.models.enml.driver import (EpisodeOptions, build_episodes,
                                              consistency_metric)
from hitl_slam_tpu.models.enml.localizer import EnmlOptions
from hitl_slam_tpu.models.enml.parallel_localizer import checkerboard_localize
from hitl_slam_tpu.io.figure8 import generate_raw_stream


def force_fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ns = 2600
    scans_l, angles_l, rel_l, _, _ = generate_raw_stream(
        num_steps=ns, num_rays=240, seed=12, num_laps=7)
    lp, lpcs, lncs, _ = build_episodes(
        scans_l, angles_l, rel_l, EpisodeOptions(clip_low=10, clip_high=10))
    est = make_map_state(lp, np.zeros((len(lp), 3, 3), np.float32), lpcs, lncs)
    stream_s = ns * 0.05
    print(f"nodes={est.num_poses}", flush=True)

    results = {}
    for label, opts, chunk in (
        ("w80 chunk=8", EnmlOptions(max_history=80), 8),
        ("w80 chunk=4", EnmlOptions(max_history=80), 4),
        ("W=10 chunk=16", EnmlOptions(), 16),
    ):
        t0 = time.perf_counter()
        out = checkerboard_localize(est.points, est.normals, est.point_mask,
                                    est.poses, opts, chunk=chunk)
        force_fetch(out)
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            out = checkerboard_localize(
                est.points + (1e-6 * (i + 1)), est.normals, est.point_mask,
                est.poses, opts, chunk=chunk)
            force_fetch(out)
            times.append((time.perf_counter() - t0) * 1e3)
        best = min(times)
        results[label] = out
        print(f"{label}: compile {compile_s:.0f}s, steady "
              f"{[round(t, 1) for t in times]} ms, "
              f"realtime x{stream_s / (best / 1e3):.0f}", flush=True)

    poses80 = np.asarray(jax.device_get(results["w80 chunk=8"][0]))
    pts_np = np.asarray(est.points)
    msk_np = np.asarray(est.point_mask)
    clouds = [pts_np[i][msk_np[i]] for i in range(est.num_poses)]
    print(f"w80 consistency: {consistency_metric(poses80, clouds):.4f} "
          f"(pre-optimization measured 0.1927)", flush=True)


if __name__ == "__main__":
    main()
