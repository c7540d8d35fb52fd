"""Round-4 TPU measurement batch 5: Pallas BCR kernel A/B.

solver/pallas_bcr.py runs the whole block-cyclic-reduction solve as ONE
kernel launch. This batch answers, at the bench session's exact state
(P=1024, 4-correction table):

  1. correctness on TPU hardware (vs bcr_solve, f32 round-off)
  2. in-loop damp+solve per-iteration: bcr_solve vs bcr_solve_pallas
     (measure4 body_b transplant)
  3. in-loop FULL LM body with each solver (measure4 body_d transplant)
  4. end-to-end lm.solve wall time with linear_solver switched

Run ALONE on the TPU (background, long timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_tpu_measure5.py
"""

import json
import os
import time

import numpy as np

SMOKE = bool(os.environ.get("MEASURE_SMOKE"))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t_start = time.perf_counter()

    def log(msg):
        print(f"[{time.perf_counter() - t_start:7.1f}s] {msg}", flush=True)

    from bench import correction_specs
    from hitl_slam_tpu.core.state import SingleInput
    from hitl_slam_tpu.io.figure8 import (generate_figure8,
                                          synthesize_correction)
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.lm import LMConfig, solve as lm_solve
    from hitl_slam_tpu.solver.assembly_soa import (normal_equations_soa,
                                                   soa_constants)
    from hitl_slam_tpu.solver.tridiag import bcr_solve
    from hitl_slam_tpu.solver.pallas_bcr import bcr_solve_pallas

    log(f"backend: {jax.devices()[0].platform} "
        f"{jax.devices()[0].device_kind}")
    results = {}

    P = 128 if SMOKE else 1024
    m = generate_figure8(num_poses=P, num_rays=40 if SMOKE else 180,
                         seed=7, drift_theta_bias=6e-4, num_laps=2)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry,
             constraint_capacity=2048 if SMOKE else 16384)
    for s in correction_specs(P):
        try:
            sel = synthesize_correction(
                m, s["corrected"], s["anchor"], s["cw"], s["aw"],
                corrected_span=s["cspan"], anchor_span=s["aspan"],
                poses=eng.get_poses())
        except ValueError:
            continue
        eng.replay_log(SingleInput(s["ctype"], 0, sel))
    log(f"session replayed: {eng.num_constraints} constraint rows")

    x0 = jnp.asarray(eng.get_poses(), jnp.float32)
    problem = build_problem(x0, eng.state.constraints)
    sc = soa_constants(problem)
    cfg = LMConfig()
    K = 4 if SMOKE else 64

    # ---- 1. correctness on hardware ----
    D0, U0, g0, c0 = normal_equations_soa(problem, sc, x0)
    diag0 = jnp.clip(jnp.diagonal(D0, axis1=-2, axis2=-1),
                     cfg.min_diagonal, cfg.max_diagonal)
    Dd0 = D0 + cfg.initial_mu * jax.vmap(jnp.diag)(diag0)
    xa = np.asarray(jax.jit(bcr_solve)(Dd0, U0, -g0))
    xb = np.asarray(jax.jit(bcr_solve_pallas)(Dd0, U0, -g0))
    rel = float(np.abs(xa - xb).max() / (np.abs(xa).max() + 1e-12))
    results["tpu_rel_err"] = rel
    log(f"correctness: rel err {rel:.3e}")
    assert rel < 1e-4, rel

    def timed_loop(make_body, init_extra, tag):
        @jax.jit
        def run(x_in):
            def body(i, carry):
                return make_body(i, carry[0], carry)

            return lax.fori_loop(0, K, body,
                                 (jnp.float32(0.0),) + init_extra(x_in))

        out = run(x0)
        _ = float(out[0])
        samples = []
        for k in range(3):
            t0 = time.perf_counter()
            out = run(x0 + 1e-6 * (k + 1))
            _ = float(out[0])
            samples.append((time.perf_counter() - t0) * 1e3 / K)
        results[tag] = round(min(samples), 4)
        log(f"{tag}: {min(samples):.4f} ms/iter "
            f"{[f'{s:.4f}' for s in samples]}")

    # ---- 2. in-loop damp+solve A/B ----
    for tag, solver in (("b_bcr_xla", bcr_solve),
                        ("b_bcr_pallas", bcr_solve_pallas)):
        def body_b(i, chk, carry, solver=solver):
            mu = carry[1]
            Dd = D0 + mu * jax.vmap(jnp.diag)(diag0)
            step = solver(Dd, U0, -g0)
            s = jnp.sum(step)
            return (chk + s, mu * (1.0 + 1e-6) + 1e-12 * s)

        timed_loop(body_b, lambda x: (jnp.float32(cfg.initial_mu),), tag)

    # ---- 3. in-loop full LM body A/B ----
    def make_body_d(solver):
        def body_d(i, chk, carry):
            x, D, U, g, mu, nu, c = carry[1:]
            diag = jnp.clip(jnp.diagonal(D, axis1=-2, axis2=-1),
                            cfg.min_diagonal, cfg.max_diagonal)
            Dd = D + mu * jax.vmap(jnp.diag)(diag)
            step = solver(Dd, U, -g)
            x_new = x + step
            Dn, Un, gn, cn = normal_equations_soa(problem, sc, x_new)
            pred = 0.5 * jnp.sum(step * (mu * diag * step - g))
            rho = (c - cn) / jnp.maximum(pred, 1e-30)
            accept = (rho > 0) & jnp.isfinite(cn)
            x = jnp.where(accept, x_new, x)
            D = jnp.where(accept, Dn, D)
            U = jnp.where(accept, Un, U)
            g = jnp.where(accept, gn, g)
            c2 = jnp.where(accept, cn, c)
            factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            mu = jnp.clip(jnp.where(accept, mu * factor, mu * nu),
                          1e-32, 1e32)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            x = x + 1e-7
            return (chk + c2, x, D, U, g, mu, nu, c2)
        return body_d

    def init_d(x):
        D, U, g, c = normal_equations_soa(problem, sc, x)
        return (x, D, U, g, jnp.float32(cfg.initial_mu), jnp.float32(2.0),
                c)

    timed_loop(make_body_d(bcr_solve), init_d, "d_lm_body_xla")
    timed_loop(make_body_d(bcr_solve_pallas), init_d, "d_lm_body_pallas")

    # ---- 4. end-to-end lm.solve ----
    for tag, solver in (("lm_solve_xla", None),
                        ("lm_solve_pallas", bcr_solve_pallas)):
        @jax.jit
        def run_lm(x_in, solver=solver):
            r = lm_solve(problem, x_in, cfg, linear_solver=solver)
            return r.final_cost, r.iterations

        out = run_lm(x0)
        _ = float(out[0])
        samples = []
        for k in range(3):
            t0 = time.perf_counter()
            out = run_lm(x0 + 1e-6 * (k + 1))
            _ = float(out[0])
            samples.append((time.perf_counter() - t0) * 1e3)
        results[tag] = dict(ms=round(min(samples), 3),
                            final_cost=float(np.asarray(out[0])),
                            iters=int(np.asarray(out[1])))
        log(f"{tag}: {results[tag]}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
