"""Round-5 TPU measurement: W=80 checkerboard assembly A/B.

VERDICT r4 item 2: enml_scale_w80_checkerboard_ms target <= 1000 ms at 1078
nodes (from 1640 ms / 41.7% HBM BW). Hypothesis: the dominant HBM traffic is
_window_gn's cross-term materialization Y = X2[:,None,:] * oh_t[:,:,None]
([M, W, 9] = 59 MB at W=80, N=256, per GN step per window) plus the oh_s
one-hot matrix ([M, W] = 6.5 MB), which is structurally redundant:
s_pose = repeat(arange(W), N), so every s-side one-hot contraction is a
contiguous reshape-sum and the cross term is a batched [W] x ([W,N]^T @ [N,9])
matmul over the query-pose axis.

Run AFTER the structured rewrite lands in localizer.py; the "before" number
is the in-flight round-5 bench capture (old code). This script times the
rewritten w80 + checkerboard sections at the exact bench shapes.

Usage (TPU, alone, background):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_tpu_measure.py
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
from hitl_slam_tpu.models.enml.driver import EpisodeOptions, build_episodes
from hitl_slam_tpu.models.enml.localizer import EnmlOptions
from hitl_slam_tpu.models.enml.parallel_localizer import checkerboard_localize
from hitl_slam_tpu.io.figure8 import generate_raw_stream

SCAN_PERIOD_S = 0.05


def force_fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jax.device_get(leaves[0])).ravel()[0])


def gate_check():
    """Pallas BCR size gate (lm.py _PALLAS_BCR_MAX_POSES): P=4096 must
    COMPILE through the relay on the Pallas path (scoped vmem ~11.5 MB,
    under the 16 MB limit); P=8192 must route to the XLA BCR and run."""
    import jax.numpy as jnp

    from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.lm import LMConfig, solve_jit

    rng = np.random.default_rng(3)
    for P in (4096, 8192):
        chain = np.zeros((P, 3), np.float32)
        heads = np.cumsum(rng.normal(0, 0.05, P)).astype(np.float32)
        chain[:, 2] = heads
        chain[1:, 0] = np.cumsum(0.4 * np.cos(heads[:-1]))
        chain[1:, 1] = np.cumsum(0.4 * np.sin(heads[:-1]))
        t = ConstraintTable.empty(16)
        t = ConstraintTable(
            ctype=t.ctype.at[0].set(int(CorrectionType.LINE_SEGMENT)),
            constrained=t.constrained.at[0].set(P - 10),
            anchor=t.anchor.at[0].set(5),
            delta_parallel=t.delta_parallel.at[0].set(0.1),
            delta_perpendicular=t.delta_perpendicular.at[0].set(0.1),
            delta_angle=t.delta_angle.at[0].set(0.05),
            penalty_dir=t.penalty_dir.at[0].set(0.3),
            active=t.active.at[0].set(True),
        )
        prob = build_problem(jnp.asarray(chain), t)
        cfg = LMConfig(max_iterations=20)
        t0 = time.perf_counter()
        r = solve_jit(prob, jnp.asarray(chain), cfg)
        force_fetch((r.poses,))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = solve_jit(prob, jnp.asarray(chain) + 1e-6, cfg)
        force_fetch((r.poses,))
        run_ms = (time.perf_counter() - t0) * 1e3
        print(f"solve P={P}: compile+first {compile_s:.1f}s, "
              f"steady {run_ms:.1f} ms, iters={int(r.iterations)}, "
              f"cost {float(r.final_cost):.4f}", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    gate_check()

    # exact bench enml_scale construction (bench.py enml_scale section)
    ns = 2600
    scans_l, angles_l, rel_l, _, _ = generate_raw_stream(
        num_steps=ns, num_rays=240, seed=12, num_laps=7)
    lp, lpcs, lncs, _ = build_episodes(
        scans_l, angles_l, rel_l, EpisodeOptions(clip_low=10, clip_high=10))
    est = make_map_state(lp, np.zeros((len(lp), 3, 3), np.float32), lpcs, lncs)
    print(f"nodes={est.num_poses} padded_n={est.points.shape[1]}", flush=True)
    stream_s = ns * SCAN_PERIOD_S

    for label, opts, chunk in (
        ("w80 chunk=8", EnmlOptions(max_history=80), 8),
        ("w80 chunk=4", EnmlOptions(max_history=80), 4),
        ("w80 chunk=16", EnmlOptions(max_history=80), 16),
        ("default W=10 chunk=16", EnmlOptions(), 16),
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
        print(f"{label}: compile+first {compile_s:.1f}s, "
              f"steady {[round(t, 1) for t in times]} ms, "
              f"realtime x{stream_s / (best / 1e3):.0f}", flush=True)

    # consistency guard: the rewrite must not change solution quality
    from hitl_slam_tpu.models.enml.driver import consistency_metric
    out = checkerboard_localize(est.points, est.normals, est.point_mask,
                                est.poses, EnmlOptions(max_history=80),
                                chunk=8)
    poses80 = np.asarray(jax.device_get(out[0]))
    pts_np = np.asarray(est.points)
    msk_np = np.asarray(est.point_mask)
    clouds = [pts_np[i][msk_np[i]] for i in range(est.num_poses)]
    cons = consistency_metric(poses80, clouds)
    print(f"w80 consistency: {cons:.4f}", flush=True)


if __name__ == "__main__":
    main()
