"""Round-5 follow-up: in-situ per-GN-step cost of the W=80 window solve.

Times _window_gn directly at the checkerboard's shapes ([8]-window vmap,
W=80, N=256, grid matcher, match_rounds=1, need_hessian=False) across
gn_iterations — the slope is the true in-situ (system + Cholesky) cost per
GN step, the intercept is match + fixed overhead. Attributes the ~600 ms of
the 1190 ms W=80 sweep that the r5 decomposition could not split further
without a device profiler.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_measure4.py
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
from hitl_slam_tpu.models.enml.localizer import (EnmlOptions,
                                                 _odometry_targets,
                                                 _window_gn)
from hitl_slam_tpu.models.enml.parallel_localizer import _make_match_fn
from hitl_slam_tpu.io.figure8 import generate_raw_stream


def force_fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ns = 2600
    scans, angles, rel, _, _ = generate_raw_stream(
        num_steps=ns, num_rays=240, seed=12, num_laps=7)
    lp, pcs, ncs, _ = build_episodes(
        scans, angles, rel, EpisodeOptions(clip_low=10, clip_high=10))
    est = make_map_state(lp, np.zeros((len(lp), 3, 3), np.float32), pcs, ncs)
    P, N = est.num_poses, est.points.shape[1]
    W, B = 80, 8
    print(f"nodes={P} N={N} W={W} batch={B}", flush=True)

    axis, d, rot, isig = _odometry_targets(est.poses, EnmlOptions())
    starts = np.arange(B) * W   # 8 real windows

    def batched(gn, mr, eval_only=False):
        o = EnmlOptions(max_history=W, gn_iterations=gn, match_rounds=mr)

        @jax.jit
        def run(points, normals, mask, poses):
            def one(start):
                idx = jnp.clip(start + jnp.arange(W), 0, P - 1)
                w_pts = points[idx]
                w_nrm = normals[idx]
                w_mask = mask[idx]
                w_poses = poses[idx]
                cidx = jnp.clip(idx[:-1], 0, P - 2)
                mf = _make_match_fn(w_pts.reshape(W * N, 2),
                                    w_nrm.reshape(W * N, 2),
                                    w_mask.reshape(W * N), W, N, o)
                np_, H = _window_gn(
                    w_poses, w_pts, w_nrm, w_mask, axis[cidx], d[cidx],
                    rot[cidx], isig[cidx],
                    jnp.ones(W - 1, poses.dtype), o, match_fn=mf,
                    eval_only=eval_only, need_hessian=eval_only)
                return np_
            return jax.vmap(one)(jnp.asarray(starts))
        return run

    rows = []
    for label, gn, mr, ev in (("eval_only (1 match + 1 system)", 0, 1, True),
                              ("gn=1 mr=1", 1, 1, False),
                              ("gn=2 mr=1", 2, 1, False),
                              ("gn=4 mr=1", 4, 1, False),
                              ("gn=8 mr=1", 8, 1, False),
                              ("gn=12 mr=1", 12, 1, False)):
        fn = batched(gn, mr, ev)
        out = fn(est.points, est.normals, est.point_mask, est.poses)
        force_fetch(out)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = fn(est.points + 1e-6 * (i + 1), est.normals,
                     est.point_mask, est.poses)
            force_fetch(out)
            ts.append((time.perf_counter() - t0) * 1e3)
        best = min(ts)
        rows.append((gn, best))
        print(f"{label}: {best:.1f} ms  (samples {[round(t,1) for t in ts]})",
              flush=True)

    gns = np.array([g for g, _ in rows[1:]], float)
    ys = np.array([t for _, t in rows[1:]], float)
    slope, intercept = np.polyfit(gns, ys, 1)
    print(f"per-GN-step (system+chol, 8-window batch): {slope:.2f} ms; "
          f"match+fixed intercept: {intercept:.1f} ms", flush=True)
    print(f"sweep attribution at 54 solves x 24 steps + 27 eval: "
          f"GN {slope * 54 * 24 / 8:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
