"""Round-3 TPU measurement batch (run when the axon relay is back).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python /tmp/r3_tpu_measure.py
Run ALONE (single TPU claim). Warm cache assumed; cold compiles add minutes.

Measures:
  1. dense refine: default two-pass vs fused_eval (flip default if fused wins)
  2. pair-matcher refine at 1024 (vs global) and the PCG path at 8192
  3. refine stage decomposition sanity (match vs lm)
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.models.hitl.refine import post_human_refine
from hitl_slam_tpu.solver.lm import LMConfig

print("backend:", jax.devices()[0].platform, flush=True)


def timeit(label, fn, n=4):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: min {min(ts):.2f} ms  {['%.1f' % t for t in ts]}",
          flush=True)
    return out


m = generate_figure8(num_poses=1024, num_rays=180, seed=7,
                     drift_theta_bias=6e-4, num_laps=2)
st = make_map_state(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
                    odometry=m.odometry, constraint_capacity=16384)
cfg = LMConfig(max_iterations=10)

for solver in ("dense", "dense_fused"):
    out = timeit(f"refine P=1024 {solver}", lambda s=solver: post_human_refine(
        st.points, st.normals, st.point_mask, st.poses, st.constraints,
        config=cfg, solver=s))
    print("   iters", int(np.asarray(out.iterations)),
          "matches", int(np.asarray(out.num_matches)),
          "cost %.4f -> %.4f" % (float(out.initial_cost),
                                 float(out.final_cost)), flush=True)

out = timeit("refine P=1024 pair-matcher", lambda: post_human_refine(
    st.points, st.normals, st.point_mask, st.poses, st.constraints,
    config=cfg, matcher="pair"))
print("   matches", int(np.asarray(out.num_matches)),
      "cost %.4f -> %.4f" % (float(out.initial_cost), float(out.final_cost)),
      flush=True)

m8 = generate_figure8(num_poses=8192, num_rays=40, seed=13,
                      drift_theta_bias=1.5e-5, num_laps=2)
st8 = make_map_state(m8.poses, m8.covariances, m8.point_clouds,
                     m8.normal_clouds, odometry=m8.odometry,
                     constraint_capacity=1024)
out8 = timeit("refine P=8192 pair+pcg", lambda: post_human_refine(
    st8.points, st8.normals, st8.point_mask, st8.poses, st8.constraints,
    capacity=262144, config=LMConfig(max_iterations=5), matcher="pair",
    max_pairs=16384), n=3)
print("   matches", int(np.asarray(out8.num_matches)),
      "dropped", int(np.asarray(out8.match_dropped)),
      "cost %.4f -> %.4f" % (float(out8.initial_cost),
                             float(out8.final_cost)), flush=True)

# 4. pair-election A/B: lax.top_k vs stable argsort+slice over [M] votes
#    (both exact + bit-equal, tests/test_stf.py; pick the faster lowering)
from hitl_slam_tpu.ops.correspond import pair_match_factors

for impl in ("top_k", "argsort"):
    fo, io_ = timeit(f"pair_match P=8192 elect={impl}",
                     lambda i=impl: pair_match_factors(
                         st8.points, st8.normals, st8.point_mask, st8.poses,
                         max_pairs=16384, capacity=262144, elect_impl=i),
                     n=3)
    print("   n_pairs", int(np.asarray(io_.n_pairs)),
          "n_matches", int(np.asarray(io_.n_matches)), flush=True)
print("MEASURE DONE", flush=True)
