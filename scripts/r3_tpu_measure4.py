"""Round-3 TPU measurement batch 4: stage-level profile of the fused cycle.

Where do the ~11 ms of the pipelined repair cycle (bench headline, P=1024 /
158k points / 12k-row constraint table) actually go?  Each cycle_step stage
is timed as a K-deep dependent chain inside ONE jitted fori_loop (the
established chained-microbenchmark pattern: every output folds into a
checksum that perturbs the next iteration's input, so XLA can neither DCE
nor overlap iterations), and the result is fetched with jax.device_get
(NOTES.md timing trap: block_until_ready is not a reliable barrier through
the axon relay).

Stages (cycle.py:54-143):
  world       pose_to_world over [P,N,2]
  em_verify   pallas em_scan (verify minima + inlier counts)
  em_refit    endpoint_adjust_batch (batched while_loop refit)
  ordering    order_on_device
  explicit    apply_explicit + constraint_deltas
  scatter     _scatter_constraints into the 16384-row table
  backprop    COP-SLAM prefix-sum window update
  build       build_problem (one-hot MXU table->pose compaction)
  lm          build_problem + lm_solve (the full joint solve)
  cycle       full cycle_step (reference total)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_tpu_measure4.py
Run ALONE (single TPU grant).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# MEASURE_SMOKE=1: tiny shapes, CPU — validates the script end-to-end, not a
# performance measurement.
SMOKE = bool(os.environ.get("MEASURE_SMOKE"))

from bench import correction_specs
from hitl_slam_tpu.core.state import SingleInput
from hitl_slam_tpu.io.figure8 import generate_figure8, synthesize_correction
from hitl_slam_tpu.models.hitl.engine import HitLSLAM
from hitl_slam_tpu.models.hitl import em_input
from hitl_slam_tpu.models.hitl.backprop import backprop
from hitl_slam_tpu.models.hitl.explicit import apply_explicit, constraint_deltas
from hitl_slam_tpu.models.hitl.ordering import order_on_device
from hitl_slam_tpu.models.hitl.repair import _scatter_constraints
from hitl_slam_tpu.ops.geometry import pose_to_world
from hitl_slam_tpu.ops.pallas_em import em_scan
from hitl_slam_tpu.solver.joint import build_problem
from hitl_slam_tpu.solver.lm import solve as lm_solve

print("backend:", jax.devices()[0].platform, flush=True)

# ---- bench-scale session state: replay 3 corrections so the constraint
# table and poses are representative of mid-session work ----
NP = 128 if SMOKE else 1024
m = generate_figure8(num_poses=NP, num_rays=40 if SMOKE else 180, seed=7,
                     drift_theta_bias=6e-4, num_laps=2)
eng = HitLSLAM()
eng.speculate = False
eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
         odometry=m.odometry, constraint_capacity=2048 if SMOKE else 16384)
specs = correction_specs(NP)
for s in specs[:3]:
    sel = synthesize_correction(m, s["corrected"], s["anchor"], s["cw"],
                                s["aw"], corrected_span=s["cspan"],
                                anchor_span=s["aspan"], poses=eng.get_poses())
    rep = eng.replay_log(SingleInput(s["ctype"], 0, sel))
    print("session cycle:", rep.accepted, "n =", eng.num_constraints,
          flush=True)

st = eng.state
# specs[3] is the one correction the bench session also REJECTS (ordering
# interleaves on the thrice-repaired map); profile the accepted specs[4]
s4 = specs[4]
sel4 = jnp.asarray(synthesize_correction(
    m, s4["corrected"], s4["anchor"], s4["cw"], s4["aw"],
    corrected_span=s4["cspan"], anchor_span=s4["aspan"],
    poses=eng.get_poses()), jnp.float32)
ctype4 = jnp.asarray(int(s4["ctype"]), jnp.int32)
n0 = jnp.asarray(eng.num_constraints, jnp.int32)

poses, covs = st.poses, st.covariances
points, mask, table = st.points, st.point_mask, st.constraints
P, N, _ = points.shape
print(f"P={P} N={N} n_constraints={int(n0)}", flush=True)

# ---- eager intermediates (fixed inputs for the isolated stages) ----
world0 = pose_to_world(poses[:, None, :], points)
segs0 = em_input.endpoint_adjust_batch(
    world0, mask, jnp.stack([sel4[0:2], sel4[2:4]]))
refit0 = segs0.reshape(4, 2)
counts0, _ = em_scan(world0, mask, refit0)
o0 = order_on_device(counts0[:, 0], counts0[:, 1], refit0)
poses1, C0 = apply_explicit(poses, ctype4, o0.sel, o0.group_mask,
                            o0.last_pose)
dpar0, dperp0, dth0, pen0, pv0 = constraint_deltas(
    poses1, o0.sel, o0.anchor_idx, o0.corrected_idx)
table2, _ = _scatter_constraints(table, ctype4, o0.anchor_idx,
                                 o0.corrected_idx, dpar0, dperp0, dth0,
                                 pen0, pv0, n0)
poses2, _ = backprop(poses1, covs, C0, o0.bp_min, o0.bp_max)
print("order valid:", bool(o0.valid), flush=True)


def csum(out):
    s = jnp.float32(0.0)
    for x in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(x.astype(jnp.float32))
    return s


def chain(label, stage, K=32, n=3):
    """Time a K-deep dependent chain of `stage(eps)`; report ms per call."""
    if SMOKE:
        K, n = 2, 1   # smoke override: tiny chain, caller K/n ignored

    @jax.jit
    def loop(seed):
        def body(_, acc):
            return csum(stage(seed + acc * jnp.float32(1e-22)))
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(jax.device_get(loop(jnp.float32(0.0))))
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(n):
        seed = jnp.float32((i + 1) * 1e-7)
        t0 = time.perf_counter()
        float(jax.device_get(loop(seed)))
        ts.append((time.perf_counter() - t0) * 1e3 / K)
    print(f"{label:10s} {min(ts):8.3f} ms/call  (compile {compile_s:.1f} s, "
          f"samples {['%.3f' % t for t in ts]})", flush=True)
    return min(ts)


r = {}
r["world"] = chain("world", lambda e: pose_to_world(poses[:, None, :] + e,
                                                    points))
r["em_verify"] = chain("em_verify", lambda e: em_scan(world0 + e, mask, sel4))
r["em_refit"] = chain(
    "em_refit",
    lambda e: em_input.endpoint_adjust_batch(
        world0 + e, mask, jnp.stack([sel4[0:2], sel4[2:4]])))
from hitl_slam_tpu.models.hitl.ordering import MIN_POSE_INLIERS

from hitl_slam_tpu.core.state import CorrectionType

# same traced min_inliers expression as cycle_step (cycle.py:106-108), so
# the profiled program matches the in-cycle one exactly
_is_point = ctype4 == int(CorrectionType.POINT)
r["ordering"] = chain(
    "ordering",
    lambda e: order_on_device(
        counts0[:, 0], counts0[:, 1], refit0 + e,
        min_inliers=jnp.where(_is_point, 0, MIN_POSE_INLIERS)))
r["explicit"] = chain(
    "explicit",
    lambda e: constraint_deltas(
        apply_explicit(poses + e, ctype4, o0.sel, o0.group_mask,
                       o0.last_pose)[0],
        o0.sel, o0.anchor_idx, o0.corrected_idx))
r["scatter"] = chain(
    "scatter",
    lambda e: _scatter_constraints(table, ctype4, o0.anchor_idx,
                                   o0.corrected_idx, dpar0 + e, dperp0, dth0,
                                   pen0, pv0, n0))
r["backprop"] = chain(
    "backprop",
    lambda e: backprop(poses1 + e, covs, C0, o0.bp_min, o0.bp_max))
r["build"] = chain("build", lambda e: build_problem(poses2 + e, table2))
# lm_only: the solve on a PRECOMPUTED problem, so 'build' is not counted
# twice in the stage sum (build_problem depends on the perturbed poses, so
# the lm stage below still rebuilds per link — kept for the in-cycle shape,
# but excluded from the reconciliation)
prob2 = build_problem(poses2, table2)
r["lm_only"] = chain(
    "lm_only", lambda e: lm_solve(prob2, poses2 + e), K=16)
r["lm"] = chain(
    "lm", lambda e: lm_solve(build_problem(poses2 + e, table2), poses2 + e),
    K=16)

# LM iteration counts at this operating point (eager, 2 samples)
for i in range(2):
    lm = lm_solve(build_problem(poses2 + jnp.float32(i * 1e-7), table2),
                  poses2)
    print("lm iterations:", int(jax.device_get(lm.iterations)),
          "final cost:", float(jax.device_get(lm.final_cost)), flush=True)

# full fused cycle for reference
from hitl_slam_tpu.models.hitl.cycle import cycle_step


def full(e):
    out = cycle_step(points, mask, poses + e, covs, table, ctype4, sel4, n0)
    return (out.poses, out.lm_final_cost, out.num_new_constraints,
            out.lm_iterations)


r["cycle"] = chain("cycle", full, K=16)

# reconciliation: one copy of each in-cycle stage — 'lm' (which includes
# its own build_problem) stands in for build+solve, so the standalone
# 'build' and 'lm_only' stages are excluded to avoid double counting.
# NOT profiled: the cycle's SECOND em_scan (the inlier-count pass at the
# refit segments, cycle.py:95-100) — add ~one em_verify to the sum.
known = sum(v for k, v in r.items()
            if k not in ("cycle", "build", "lm_only"))
print(f"\nsum of stages = {known:.3f} ms (+ ~{r['em_verify']:.3f} for the "
      f"unprofiled second em_scan) vs full cycle {r['cycle']:.3f} ms",
      flush=True)
print("MEASURE4 DONE", flush=True)
