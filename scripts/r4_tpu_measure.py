"""Round-4 TPU measurement batch: the VERDICT r3 perf items.

A. queue_chain damping warm-start A/B (item 3): does carrying accepted
   cycles' exit mu into the next correction's LM cut iterations/cycle time
   without changing final costs?
B. chain length scaling: K=4 vs K=8 ms/cycle (dispatch amortization).
C. P=8192 pair+PCG refine preconditioner A/B (item 4): block-Jacobi
   (r3 default, 1302 ms end-to-end) vs exact-tridiagonal BCR
   preconditioning (new default).
D. EnML W=80 at reference scale (item 7): chunk A/B — the r3 bench ran
   chunk=2 (1701 ms at 1078 nodes); larger chunks cut dispatch count and
   may lift utilization if memory allows.

Run ALONE on the TPU (background, long timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_tpu_measure.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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

    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.io.figure8 import (generate_figure8,
                                          synthesize_correction)
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    log(f"backend: {jax.devices()[0].platform} "
        f"{jax.devices()[0].device_kind}")

    results = {}

    # ---- A + B: chain warm-start and length ----
    try:
        from hitl_slam_tpu.models.hitl.cycle import queue_chain

        m = generate_figure8(num_poses=1024, num_rays=180, seed=7,
                             drift_theta_bias=6e-4, num_laps=2)
        eng = HitLSLAM()
        eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
                 constraint_capacity=16384)
        st = eng.state
        specs = correction_specs(1024)
        sel_cycle = [jnp.asarray(synthesize_correction(
            m, s["corrected"], s["anchor"], s["cw"], s["aw"],
            corrected_span=s["cspan"], anchor_span=s["aspan"],
            poses=np.asarray(m.poses)), jnp.float32) for s in specs[:2]]
        p0 = jnp.asarray(m.poses, jnp.float32)
        c0v = jnp.asarray(m.covariances, jnp.float32)
        n0 = jnp.asarray(0, jnp.int32)

        def run_chain(K, warm, tag):
            if left() < 10 * 60:
                raise TimeoutError("budget")
            sels = jnp.stack([sel_cycle[k % 2] for k in range(K)])
            ctypes = jnp.full((K,), 4, jnp.int32)
            tbl = ConstraintTable.empty(16384)
            out = queue_chain(st.points, st.point_mask, p0, c0v, tbl,
                              ctypes, sels, n0, warm_start_mu=warm)
            fetch(out)
            per = out[4]
            acc = np.asarray(per[0])
            iters = np.asarray(per[4])
            costs = np.asarray(per[6])
            samples = []
            for k in range(3):
                pk = p0 + 1e-6 * (k + 1)
                t0 = time.perf_counter()
                out = queue_chain(st.points, st.point_mask, pk, c0v, tbl,
                                  ctypes, sels, n0, warm_start_mu=warm)
                fetch(out)
                samples.append((time.perf_counter() - t0) * 1e3 / K)
            r = dict(ms_per_cycle=round(min(samples), 3),
                     samples=[round(s, 2) for s in samples],
                     accepted=acc.tolist(),
                     lm_iterations=iters.tolist(),
                     final_costs=[float(f"{c:.6g}") for c in costs])
            results[tag] = r
            log(f"{tag}: {r}")

        run_chain(8, False, "chain_k8_cold_mu")
        run_chain(8, True, "chain_k8_warm_mu")
        run_chain(4, False, "chain_k4_cold_mu")
    except Exception as e:
        log(f"chain section skipped/partial: {e!r}")

    # ---- C: 8192 pair refine preconditioner A/B ----
    try:
        if left() < 15 * 60:
            raise TimeoutError("budget")
        from hitl_slam_tpu.ops import correspond as C
        from hitl_slam_tpu.solver.lm import LMConfig
        from hitl_slam_tpu.solver.stf_solve import stf_pcg_lm_solve

        m8 = generate_figure8(num_poses=8192, num_rays=40, seed=13,
                              drift_theta_bias=1.5e-5, num_laps=2)
        eng8 = HitLSLAM()
        eng8.init(m8.poses, m8.covariances, m8.point_clouds,
                  m8.normal_clouds, constraint_capacity=32768)
        st8 = eng8.state
        pm = jax.jit(lambda pts, nrm, msk, ps: C.pair_match_factors(
            pts, nrm, msk, ps, max_pairs=16384, capacity=262144)[0])
        stf8 = pm(st8.points, st8.normals, st8.point_mask, st8.poses)
        fetch(stf8)
        t0 = time.perf_counter()
        stf8 = pm(st8.points + 1e-6, st8.normals, st8.point_mask, st8.poses)
        fetch(stf8)
        results["match_8192_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        results["match_8192_n"] = int(np.asarray(jnp.sum(stf8.valid)))
        log(f"match_8192: {results['match_8192_ms']} ms, "
            f"{results['match_8192_n']} matches")
        cfg5 = LMConfig(max_iterations=5)
        for prec in ("jacobi", "tridiag"):
            if left() < 8 * 60:
                raise TimeoutError("budget")
            out = stf_pcg_lm_solve(st8.poses, st8.constraints, stf8,
                                   config=cfg5, max_pairs=16384,
                                   precondition=prec)
            fetch(out)
            samples = []
            for k in range(2):
                t0 = time.perf_counter()
                out = stf_pcg_lm_solve(st8.poses + 1e-6 * (k + 1),
                                       st8.constraints, stf8, config=cfg5,
                                       max_pairs=16384, precondition=prec)
                fetch(out)
                samples.append((time.perf_counter() - t0) * 1e3)
            r = dict(lm_ms=round(min(samples), 1),
                     samples=[round(s, 1) for s in samples],
                     final_cost=float(np.asarray(out.final_cost)),
                     iterations=int(np.asarray(out.iterations)))
            results[f"pcg_8192_{prec}"] = r
            log(f"pcg_8192_{prec}: {r}")
    except Exception as e:
        log(f"pcg section skipped/partial: {e!r}")

    # ---- D: EnML W=80 at scale, chunk A/B ----
    try:
        if left() < 12 * 60:
            raise TimeoutError("budget")
        from hitl_slam_tpu.core.state import make_map_state
        from hitl_slam_tpu.io.figure8 import generate_raw_stream
        from hitl_slam_tpu.models.enml.driver import (EpisodeOptions,
                                                      build_episodes)
        from hitl_slam_tpu.models.enml.localizer import EnmlOptions
        from hitl_slam_tpu.models.enml.parallel_localizer import (
            checkerboard_localize)

        scans_l, angles_l, rel_l, _, _ = generate_raw_stream(
            num_steps=2600, num_rays=240, seed=12, num_laps=7)
        lp, lpcs, lncs, _ = build_episodes(
            scans_l, angles_l, rel_l,
            EpisodeOptions(clip_low=10, clip_high=10))
        est_l = make_map_state(
            lp, np.zeros((len(lp), 3, 3), np.float32), lpcs, lncs)
        log(f"enml scale: {est_l.num_poses} nodes")
        w80 = EnmlOptions(max_history=80)
        for chunk in (2, 4, 8):
            if left() < 6 * 60:
                raise TimeoutError("budget")
            try:
                out = checkerboard_localize(est_l.points, est_l.normals,
                                            est_l.point_mask, est_l.poses,
                                            w80, chunk=chunk)
                fetch(out)
                t0 = time.perf_counter()
                out = checkerboard_localize(est_l.points + 1e-6,
                                            est_l.normals, est_l.point_mask,
                                            est_l.poses, w80, chunk=chunk)
                fetch(out)
                ms = (time.perf_counter() - t0) * 1e3
                results[f"enml_w80_chunk{chunk}_ms"] = round(ms, 1)
                log(f"enml_w80 chunk={chunk}: {ms:.1f} ms")
            except Exception as e:
                log(f"enml_w80 chunk={chunk} failed: {e!r}")
    except Exception as e:
        log(f"enml section skipped/partial: {e!r}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
