"""Round-4 TPU measurement batch 3: the 19-iteration chain cycle + the
solve-only multiple.

BENCH_LOCAL_r4.json: the honest headline chain runs [5, 19, 6, 7] LM
iterations — cycle 1 costs as much as the other three together, and
vs_optimized_cpu lands at 5.41x (target >=10x). The CPU bound is
SOLVE-ONLY (banded-Cholesky LM on each accepted cycle's snapshot), while
the device number is the FULL cycle (EM sweeps + ordering + explicit +
backprop + table scatter + build + LM). This batch:

  t1. per-iteration trace of every session solve (25-iter scan replica of
      lm.py's body): which of cycle 1's 19 iterations are REJECTED steps
      (damping search) vs slow accepted progress — picks the fix
      (initial_mu prior vs nothing-to-fix).
  t2. initial_mu sweep on the fused 4-cycle chain (1e-4 default /
      1e-3 / 1e-2): per-cycle iterations, chain ms, final costs. Only a
      measured Pareto win changes the default.
  t3. device SOLVE-ONLY timing on the same snapshots the CPU bound
      solves (build_problem + lm_solve, one jitted program): the
      apples-to-apples vs_optimized_cpu_solve_only the bench should
      report alongside the full-cycle ratio.

Run ALONE on the TPU (background, long timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_tpu_measure3.py
"""

import dataclasses
import json
import time

import numpy as np


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

    def left():
        return 110 * 60 - (time.perf_counter() - t_start)

    def log(msg):
        print(f"[{time.perf_counter() - t_start:7.1f}s] {msg}", flush=True)

    def fetch(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "size")]
        leaf = min(leaves, key=lambda x: x.size)
        return float(np.sum(np.asarray(jax.device_get(leaf), np.float64)))

    from bench import correction_specs
    from hitl_slam_tpu.core.state import SingleInput
    from hitl_slam_tpu.io.figure8 import (generate_figure8,
                                          synthesize_correction)
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM
    from hitl_slam_tpu.models.hitl.cycle import queue_chain
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.lm import LMConfig, solve as lm_solve
    from hitl_slam_tpu.solver.assembly_soa import (normal_equations_soa,
                                                   soa_constants)
    from hitl_slam_tpu.solver.tridiag import bcr_solve

    log(f"backend: {jax.devices()[0].platform} "
        f"{jax.devices()[0].device_kind}")
    results = {}

    # ---- rebuild the bench session exactly (bench.py run_session) ----
    P = 1024
    m = generate_figure8(num_poses=P, num_rays=180, seed=7,
                         drift_theta_bias=6e-4, num_laps=2)
    CAPACITY = 16384
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=CAPACITY)
    snapshots, accepted = [], []
    for s in correction_specs(P):
        try:
            sel = synthesize_correction(
                m, s["corrected"], s["anchor"], s["cw"], s["aw"],
                corrected_span=s["cspan"], anchor_span=s["aspan"],
                poses=eng.get_poses())
        except ValueError:
            continue
        rep = eng.replay_log(SingleInput(s["ctype"], 0, sel))
        if rep.accepted:
            snapshots.append((np.asarray(eng.last_pre_solve_poses,
                                         np.float32),
                              eng.num_constraints))
            accepted.append((int(s["ctype"]), np.asarray(sel, np.float32)))
    log(f"session replayed: {len(accepted)} accepted cycles, "
        f"{eng.num_constraints} constraint rows")

    tbl = eng.state.constraints

    def masked_table(n_active):
        act = np.asarray(tbl.active).copy()
        act[n_active:] = False
        return dataclasses.replace(tbl, active=jnp.asarray(act))

    # ---- t1: per-iteration LM trace (scan replica of lm.py body) ----
    cfg = LMConfig()
    TRACE_ITERS = 25

    @jax.jit
    def lm_trace(poses0, table):
        problem = build_problem(poses0, table)
        sc = soa_constants(problem)

        def assemble(x):
            return normal_equations_soa(problem, sc, x)

        D0, U0, g0, c0 = assemble(poses0)

        def body(state, _):
            x, D, U, g, mu, nu, c = state
            diag = jnp.clip(jnp.diagonal(D, axis1=-2, axis2=-1),
                            cfg.min_diagonal, cfg.max_diagonal)
            D_damped = D + mu * jax.vmap(jnp.diag)(diag)
            step = bcr_solve(D_damped, U, -g)
            x_new = x + step
            D_new, U_new, g_new, c_new = assemble(x_new)
            pred = 0.5 * jnp.sum(step * (mu * diag * step - g))
            rho = (c - c_new) / jnp.maximum(pred, 1e-30)
            accept = (rho > 0) & jnp.isfinite(c_new)
            x = jnp.where(accept, x_new, x)
            D = jnp.where(accept, D_new, D)
            U = jnp.where(accept, U_new, U)
            g = jnp.where(accept, g_new, g)
            c_next = jnp.where(accept, c_new, c)
            factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            mu_next = jnp.where(accept, mu * factor, mu * nu)
            nu = jnp.where(accept, 2.0, nu * 2.0)
            mu_next = jnp.clip(mu_next, 1e-32, 1e32)
            ys = (accept, rho, mu, c_next, jnp.linalg.norm(step))
            return (x, D, U, g, mu_next, nu, c_next), ys

        init = (poses0, D0, U0, g0,
                jnp.asarray(cfg.initial_mu, poses0.dtype),
                jnp.asarray(2.0, poses0.dtype), c0)
        _, ys = lax.scan(body, init, None, length=TRACE_ITERS)
        return c0, ys

    try:
        for i, (start, n_act) in enumerate(snapshots):
            c0, (acc, rho, mu, c, snorm) = jax.device_get(
                lm_trace(jnp.asarray(start), masked_table(n_act)))
            results[f"t1_cycle{i}"] = {
                "c0": float(c0),
                "accept": np.asarray(acc).astype(int).tolist(),
                "rho": [round(float(r), 4) for r in rho],
                "mu": [float(f"{float(x):.3g}") for x in mu],
                "cost": [float(f"{float(x):.6g}") for x in c],
                "step_norm": [float(f"{float(x):.3g}") for x in snorm],
            }
            log(f"t1 cycle {i}: c0={float(c0):.4g} "
                f"accept={np.asarray(acc).astype(int).tolist()}")
            log(f"   mu={['%.1e' % float(x) for x in mu]}")
            log(f"   cost={['%.5g' % float(x) for x in c]}")
    except Exception as e:
        log(f"t1 skipped/partial: {e!r}")

    # ---- t2: initial_mu sweep on the fused chain ----
    try:
        from hitl_slam_tpu.core.state import ConstraintTable as _CT

        ctypes_chain = jnp.asarray([c for c, _ in accepted[:4]], jnp.int32)
        sels_chain = jnp.stack([jnp.asarray(s, jnp.float32)
                                for _, s in accepted[:4]])
        p0 = jnp.asarray(m.poses, jnp.float32)
        c0v = jnp.asarray(m.covariances, jnp.float32)
        st = eng.state

        for mu_init in (1e-4, 1e-3, 1e-2):
            if left() < 15 * 60:
                raise TimeoutError("budget")
            lmc = LMConfig(initial_mu=mu_init)

            @jax.jit
            def chained(poses, covs, table, n0, lmc=lmc):
                poses2, covs2, table2, n_end, per = queue_chain(
                    st.points, st.point_mask, poses, covs, table,
                    ctypes_chain, sels_chain, n0, lm_config=lmc)
                return (poses2, jnp.sum(poses2) + jnp.sum(covs2), n_end, per)

            t0v = _CT.empty(CAPACITY)
            n0 = jnp.asarray(0, jnp.int32)
            outp, chk, nend, per = chained(p0, c0v, t0v, n0)
            _ = float(chk)
            iters = np.asarray(per[4]).tolist()
            costs = [float(f"{float(x):.6g}") for x in np.asarray(per[6])]
            samples = []
            for k in range(3):
                pk = p0 + 1e-6 * (k + 1)
                t0 = time.perf_counter()
                _o, chk, _n, _p = chained(pk, c0v, t0v, n0)
                _ = float(chk)
                samples.append((time.perf_counter() - t0) * 1e3 / 4)
            results[f"t2_mu{mu_init:g}"] = {
                "per_cycle_ms": round(min(samples), 2),
                "samples": [round(s, 2) for s in samples],
                "iters": iters, "final_costs": costs,
                "accepted": np.asarray(per[0]).astype(int).tolist(),
            }
            log(f"t2 mu0={mu_init:g}: {results[f't2_mu{mu_init:g}']}")
    except Exception as e:
        log(f"t2 skipped/partial: {e!r}")

    # ---- t3: device solve-only on the CPU bound's exact snapshots ----
    try:
        @jax.jit
        def solve_only(poses0, table):
            problem = build_problem(poses0, table)
            r = lm_solve(problem, poses0, cfg)
            return r.poses, r.final_cost, r.iterations

        per_snap = []
        for i, (start, n_act) in enumerate(snapshots):
            tblm = masked_table(n_act)
            sp = jnp.asarray(start)
            out = solve_only(sp, tblm)
            _ = fetch(out)
            samples = []
            for k in range(3):
                t0 = time.perf_counter()
                out = solve_only(sp + 1e-6 * (k + 1), tblm)
                _ = float(out[1])
                samples.append((time.perf_counter() - t0) * 1e3)
            per_snap.append(min(samples))
            log(f"t3 snapshot {i}: {min(samples):.2f} ms "
                f"iters={int(np.asarray(out[2]))} "
                f"cost={float(np.asarray(out[1])):.6g} {samples}")
        results["t3_solve_only_ms_per_cycle"] = [round(x, 2)
                                                 for x in per_snap]
        results["t3_solve_only_ms_median"] = round(
            float(np.median(per_snap)), 2)
    except Exception as e:
        log(f"t3 skipped/partial: {e!r}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
