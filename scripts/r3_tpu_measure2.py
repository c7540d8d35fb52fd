"""Round-3 TPU measurement batch 2: trap-proof timing of the refine A/Bs.

The first batch (r3_tpu_measure.py) hit the documented axon-relay timing
trap: block_until_ready on some outputs returns before the work completes
(NOTES.md "TIMING TRAP").  Here every output leaf is forced with
jax.device_get INSIDE the timing window and the input points are perturbed
per call so no relay-side result reuse can fake a number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_tpu_measure2.py
Run ALONE (single TPU claim). Warm cache assumed (batch 1 compiled it all).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.models.hitl.refine import post_human_refine
from hitl_slam_tpu.solver.lm import LMConfig

print("backend:", jax.devices()[0].platform, flush=True)


def force(out):
    """Fetch every leaf to host — the only reliable completion barrier."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(out):
        total += float(np.sum(np.asarray(jax.device_get(leaf),
                                         dtype=np.float64)))
    return total


def timeit(label, fn, n=4):
    out = fn(0)
    force(out)
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        out = fn(i)
        force(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: min {min(ts):.2f} ms  {['%.1f' % t for t in ts]}",
          flush=True)
    return out


m = generate_figure8(num_poses=1024, num_rays=180, seed=7,
                     drift_theta_bias=6e-4, num_laps=2)
st = make_map_state(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
                    odometry=m.odometry, constraint_capacity=16384)
cfg = LMConfig(max_iterations=10)

# Per-call input perturbation: shift every point by i*1e-6 m (does not
# change matches/iterations materially, defeats any result caching).
def perturbed(i):
    return st.points + jnp.float32(i * 1e-6)

for solver in ("dense", "dense_fused"):
    out = timeit(
        f"refine P=1024 {solver}",
        lambda i, s=solver: post_human_refine(
            perturbed(i), st.normals, st.point_mask, st.poses,
            st.constraints, config=cfg, solver=s))
    print("   iters", int(np.asarray(out.iterations)),
          "matches", int(np.asarray(out.num_matches)),
          "cost %.4f -> %.4f" % (float(out.initial_cost),
                                 float(out.final_cost)), flush=True)

print("MEASURE2 DONE", flush=True)
