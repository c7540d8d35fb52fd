"""Round-3 probe: is there a fixed per-loop-iteration overhead on axon TPU?

measure4 showed every tiny cycle stage costs ~0.85 ms/call inside the
chained fori_loop harness — ordering ([1024] reductions) as much as world
([1024,256,2] transform). Either the chain harness has a per-iteration
floor, or loop iterations on this backend carry a fixed cost that would
also tax the LM while_loop (~10 iterations/cycle) — in which case
unrolling the LM body k-fold is the biggest remaining headline lever.

Probes (all chained K-deep like measure4):
  trivial      scalar body (pure chain floor)
  vec          [1024,3] elementwise body
  inner_fori   body = fori_loop(10, scalar op)   -> per-INNER-iter cost
  inner_while  body = while_loop(counter<10)     -> per-INNER-iter cost
  assemble     one SoA normal-equations assembly (the LM body's main work)
  bcr          one bcr_solve at P=1024           (the LM body's solver)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_tpu_probe_loop.py
Run ALONE.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import correction_specs
from hitl_slam_tpu.core.state import SingleInput
from hitl_slam_tpu.io.figure8 import generate_figure8, synthesize_correction
from hitl_slam_tpu.models.hitl.engine import HitLSLAM
from hitl_slam_tpu.solver.joint import build_problem
from hitl_slam_tpu.solver.assembly_soa import normal_equations_soa, soa_constants
from hitl_slam_tpu.solver.tridiag import bcr_solve

print("backend:", jax.devices()[0].platform, flush=True)

m = generate_figure8(num_poses=1024, num_rays=180, seed=7,
                     drift_theta_bias=6e-4, num_laps=2)
eng = HitLSLAM()
eng.speculate = False
eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
         odometry=m.odometry, constraint_capacity=16384)
for s in correction_specs(1024)[:3]:
    sel = synthesize_correction(m, s["corrected"], s["anchor"], s["cw"],
                                s["aw"], corrected_span=s["cspan"],
                                anchor_span=s["aspan"], poses=eng.get_poses())
    eng.replay_log(SingleInput(s["ctype"], 0, sel))

poses = eng.state.poses
problem = build_problem(poses, eng.state.constraints)
sc = soa_constants(problem)
D0, U0, g0, c0 = normal_equations_soa(problem, sc, poses)
print("n_constraints:", eng.num_constraints, flush=True)


def csum(out):
    s = jnp.float32(0.0)
    for x in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(x.astype(jnp.float32))
    return s


def chain(label, stage, K=32, n=3):
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
        t0 = time.perf_counter()
        float(jax.device_get(loop(jnp.float32((i + 1) * 1e-7))))
        ts.append((time.perf_counter() - t0) * 1e3 / K)
    print(f"{label:12s} {min(ts):8.4f} ms/call (compile {compile_s:.1f} s, "
          f"{['%.4f' % t for t in ts]})", flush=True)
    return min(ts)


v0 = jnp.asarray(np.random.default_rng(0).normal(size=(1024, 3)), jnp.float32)

floor = chain("trivial", lambda e: e * jnp.float32(1.0000001) + 1.0)
chain("vec", lambda e: jnp.sin(v0 + e))


def inner_fori(e):
    return lax.fori_loop(0, 10, lambda i, a: a * jnp.float32(0.999999) + e,
                         jnp.float32(1.0))


def inner_while(e):
    def cond(s):
        return s[1] < 10

    def body(s):
        return (s[0] * jnp.float32(0.999999) + e, s[1] + 1)

    return lax.while_loop(cond, body, (jnp.float32(1.0), jnp.int32(0)))[0]


f10 = chain("inner_fori", inner_fori)
w10 = chain("inner_while", inner_while)
print(f"  -> per inner fori iter  {(f10 - floor) / 10:.4f} ms", flush=True)
print(f"  -> per inner while iter {(w10 - floor) / 10:.4f} ms", flush=True)

chain("assemble", lambda e: normal_equations_soa(problem, sc, poses + e))
chain("bcr", lambda e: bcr_solve(D0 + e * jnp.eye(3, dtype=jnp.float32),
                                 U0, -g0))

# and: 10 dependent assemble+bcr pairs inside ONE body (the unrolled-LM
# shape) — if the while-iteration overhead is real, this should cost far
# less than 10x the chained single-call numbers
def lm10(e):
    def it(_, x):
        D, U, g, _c = normal_equations_soa(problem, sc, x)
        step = bcr_solve(D + e * jnp.eye(3, dtype=jnp.float32), U, -g)
        return x + jnp.float32(0.001) * step
    return lax.fori_loop(0, 10, it, poses + e)


t10 = chain("lm10_fused", lm10, K=8)
print(f"  -> per assemble+bcr iter inside fori {(t10 - floor) / 10:.4f} ms",
      flush=True)
print("PROBE DONE", flush=True)
