"""Round-4 TPU measurement batch 4: in-loop attribution of one LM iteration.

Post-LM-fix the fused cycle is ~4.7 ms (scripts/r3_tpu_measure4.py) of
which lm_only is ~3.5 ms at 7 iterations (~0.5 ms/iter). The isolated
stage numbers don't attribute WITHIN an iteration, and XLA overlaps
differently inside loops than in standalone programs (NOTES.md r2: thomas
scan 5x faster standalone, 15x slower in-loop). So: time each candidate
slice of the LM body inside a K=64 fori_loop with a sequential carry
dependency, at the bench session's exact state (P=1024, 4-correction
constraint table). Slices:

  a. assemble-only        (SoA normal equations at a carried x)
  b. damp+BCR-only        (fixed D,U,g; mu varies with the carry)
  c. assemble + damp+BCR  (one full linear step, no acceptance logic)
  d. full LM body         (lm.solve's exact per-iteration math)

b vs (c - a) also exposes how much fusion hides. The decision rule:
whichever slice dominates in-loop is the Pallas-kernel candidate; if
(d - c) is large, the acceptance bookkeeping (norms, where-selects) is
the surprise cost.

Run ALONE on the TPU (background, long timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_tpu_measure4.py
"""

import json
import os
import time

import numpy as np

# MEASURE_SMOKE=1: tiny shapes, CPU — validates the script end-to-end, not a
# performance measurement.
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
    from hitl_slam_tpu.solver.lm import LMConfig
    from hitl_slam_tpu.solver.assembly_soa import (normal_equations_soa,
                                                   soa_constants)
    from hitl_slam_tpu.solver.tridiag import bcr_solve

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

    def timed_loop(make_body, init_extra, tag):
        """K-iteration fori_loop; carry threads a scalar checksum through
        every iteration so nothing reorders/elides; 1 warmup + 3 samples."""

        @jax.jit
        def run(x_in):
            def body(i, carry):
                chk = carry[0]
                out = make_body(i, chk, carry)
                return out

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
        return out

    # a. assemble-only
    def body_a(i, chk, carry):
        x = carry[1]
        D, U, g, c = normal_equations_soa(problem, sc, x)
        x2 = x + 1e-9 * c  # sequential dependency on the result
        return (c + chk, x2)

    timed_loop(body_a, lambda x: (x,), "a_assemble_only")

    # b. damp + BCR only (fixed system from x0; mu carried)
    D0, U0, g0, c0 = normal_equations_soa(problem, sc, x0)
    diag0 = jnp.clip(jnp.diagonal(D0, axis1=-2, axis2=-1),
                     cfg.min_diagonal, cfg.max_diagonal)

    def body_b(i, chk, carry):
        mu = carry[1]
        Dd = D0 + mu * jax.vmap(jnp.diag)(diag0)
        step = bcr_solve(Dd, U0, -g0)
        s = jnp.sum(step)
        return (chk + s, mu * (1.0 + 1e-6) + 1e-12 * s)

    timed_loop(body_b, lambda x: (jnp.float32(cfg.initial_mu),),
               "b_damp_bcr_only")

    # c. assemble + damp + BCR (one linear step, no acceptance logic)
    def body_c(i, chk, carry):
        x, mu = carry[1], carry[2]
        D, U, g, c = normal_equations_soa(problem, sc, x)
        diag = jnp.clip(jnp.diagonal(D, axis1=-2, axis2=-1),
                        cfg.min_diagonal, cfg.max_diagonal)
        Dd = D + mu * jax.vmap(jnp.diag)(diag)
        step = bcr_solve(Dd, U, -g)
        x2 = x + 1e-3 * step  # damped walk keeps the problem live
        return (chk + c, x2, mu * (1.0 + 1e-6))

    timed_loop(body_c, lambda x: (x, jnp.float32(cfg.initial_mu)),
               "c_assemble_damp_bcr")

    # d. full LM body (exact per-iteration math incl. acceptance)
    def body_d(i, chk, carry):
        x, D, U, g, mu, nu, c = carry[1:]
        diag = jnp.clip(jnp.diagonal(D, axis1=-2, axis2=-1),
                        cfg.min_diagonal, cfg.max_diagonal)
        Dd = D + mu * jax.vmap(jnp.diag)(diag)
        step = bcr_solve(Dd, U, -g)
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
        mu = jnp.clip(jnp.where(accept, mu * factor, mu * nu), 1e-32, 1e32)
        nu = jnp.where(accept, 2.0, nu * 2.0)
        # keep iterating on a live problem: perturb x a hair each iter
        x = x + 1e-7
        return (chk + c2, x, D, U, g, mu, nu, c2)

    def init_d(x):
        D, U, g, c = normal_equations_soa(problem, sc, x)
        return (x, D, U, g, jnp.float32(cfg.initial_mu), jnp.float32(2.0),
                c)

    timed_loop(body_d, init_d, "d_full_lm_body")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
