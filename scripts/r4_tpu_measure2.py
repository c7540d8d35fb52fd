"""Round-4 TPU measurement batch 2: decompose the P=8192 pair refine.

VERDICT r3 item 4 wants the end-to-end pair refine < 1000 ms (r4 batch 1:
match 783.6 ms + 5-iter PCG LM 968.3 ms = ~1.75 s). This batch answers
where each half goes and A/Bs the candidate levers WITHOUT changing
defaults blind:

match side (ops/correspond.py pair_match_factors):
  m1. grid_match alone (stage-1 vote input)
  m2. stage-1 election alone (grid vote + sort + top_k) — script replica
  m3. full matcher, elect_impl top_k vs argsort
  m4. full matcher, pair_chunk 512 (default) vs 2048 (fewer lax.map steps)

solve side (solver/stf_solve.py stf_pcg_lm_solve):
  s1. assemble_all (normal_equations + _stf_system_compact) alone
  s2. cost_only pass alone
  s3. bcr_solve alone at P=8192 (one preconditioner apply)
  s4. pcg_solve alone on the assembled system: cg iterations + time at
      tolerance 1e-5 (r3 hardcoded) vs 1e-2 (new inexact-Newton default)
  s5. full stf_pcg_lm_solve: cg_tolerance 1e-5 vs 1e-2 vs 5e-2, and
      max_iterations 5 vs 3 — lm_ms + final_cost parity check

Run ALONE on the TPU (background, long timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_tpu_measure2.py
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

    def timed(fn, *args, n=2, perturb=None):
        """warmup + n timed samples; perturb(k) returns fresh args."""
        out = fn(*args)
        fetch(out)
        samples = []
        for k in range(n):
            a = perturb(k) if perturb is not None else args
            t0 = time.perf_counter()
            out = fn(*a)
            fetch(out)
            samples.append((time.perf_counter() - t0) * 1e3)
        return min(samples), samples, out

    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM
    from hitl_slam_tpu.ops import correspond as C
    from hitl_slam_tpu.ops.geometry import pose_to_world, rotate
    from hitl_slam_tpu.solver.lm import LMConfig
    from hitl_slam_tpu.solver import stf_solve as S
    from hitl_slam_tpu.solver.joint import build_problem, normal_equations
    from hitl_slam_tpu.solver.tridiag import bcr_solve
    from hitl_slam_tpu.solver.cg import pcg_solve

    log(f"backend: {jax.devices()[0].platform} "
        f"{jax.devices()[0].device_kind}")

    results = {}

    m8 = generate_figure8(num_poses=8192, num_rays=40, seed=13,
                          drift_theta_bias=1.5e-5, num_laps=2)
    eng8 = HitLSLAM()
    eng8.init(m8.poses, m8.covariances, m8.point_clouds,
              m8.normal_clouds, constraint_capacity=32768)
    st8 = eng8.state
    P = 8192

    # ---------------- match side ----------------
    try:
        @jax.jit
        def gm_only(pts, nrm, msk, ps):
            world = pose_to_world(ps[:, None, :], pts)
            wnrm = rotate(ps[:, 2][:, None], nrm)
            return C.grid_match(world, wnrm, msk,
                                C.POINT_MATCH_THRESHOLD,
                                float(np.cos(C.MAX_STF_ANGLE_ERROR)),
                                64, None)

        ms, ss, _ = timed(
            gm_only, st8.points, st8.normals, st8.point_mask, st8.poses,
            perturb=lambda k: (st8.points + 1e-6 * (k + 1), st8.normals,
                               st8.point_mask, st8.poses))
        results["m1_grid_match_ms"] = round(ms, 1)
        log(f"m1 grid_match: {ms:.1f} ms {ss}")

        INT_MAX = jnp.iinfo(jnp.int32).max

        @jax.jit
        def elect_only(pts, nrm, msk, ps):
            world = pose_to_world(ps[:, None, :], pts)
            wnrm = rotate(ps[:, 2][:, None], nrm)
            mm = C.grid_match(world, wnrm, msk,
                              C.POINT_MATCH_THRESHOLD,
                              float(np.cos(C.MAX_STF_ANGLE_ERROR)),
                              64, None)
            N = pts.shape[1]
            M = pts.shape[0] * N
            src_pose = jnp.arange(M, dtype=jnp.int32) // N
            tgt_pose = mm.target // N
            pi_ = jnp.minimum(src_pose, tgt_pose)
            pj_ = jnp.maximum(src_pose, tgt_pose)
            key = jnp.where(mm.valid, pi_ * pts.shape[0] + pj_, INT_MAX)
            skey = jnp.sort(key)
            pos = jnp.arange(M, dtype=jnp.int32)
            is_new = (pos == 0) | (skey != jnp.roll(skey, 1))
            run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
            is_last = ((pos == M - 1) | (skey != jnp.roll(skey, -1))) \
                & (skey != INT_MAX)
            votes = jnp.where(is_last, pos - run_start + 1, -1)
            topv, topi = jax.lax.top_k(votes, 16384)
            return skey[topi], topv

        ms, ss, _ = timed(
            elect_only, st8.points, st8.normals, st8.point_mask, st8.poses,
            perturb=lambda k: (st8.points + 1e-6 * (k + 1), st8.normals,
                               st8.point_mask, st8.poses))
        results["m2_elect_ms"] = round(ms, 1)
        log(f"m2 elect (grid+sort+top_k): {ms:.1f} ms {ss}")

        for tag, kw in (("top_k", dict()),
                        ("argsort", dict(elect_impl="argsort")),
                        ("chunk2048", dict(pair_chunk=2048)),
                        ("chunk4096", dict(pair_chunk=4096))):
            if left() < 20 * 60:
                raise TimeoutError("budget")
            pm = jax.jit(lambda pts, nrm, msk, ps, kw=kw:
                         C.pair_match_factors(pts, nrm, msk, ps,
                                              max_pairs=16384,
                                              capacity=262144, **kw)[0])
            ms, ss, stf_out = timed(
                pm, st8.points, st8.normals, st8.point_mask, st8.poses,
                perturb=lambda k: (st8.points + 1e-6 * (k + 1), st8.normals,
                                   st8.point_mask, st8.poses))
            results[f"m3_match_{tag}_ms"] = round(ms, 1)
            log(f"m3 match {tag}: {ms:.1f} ms {ss}")
    except Exception as e:
        log(f"match section skipped/partial: {e!r}")

    # ---------------- solve side ----------------
    try:
        if left() < 25 * 60:
            raise TimeoutError("budget")
        pm0 = jax.jit(lambda pts, nrm, msk, ps: C.pair_match_factors(
            pts, nrm, msk, ps, max_pairs=16384, capacity=262144)[0])
        stf8 = pm0(st8.points, st8.normals, st8.point_mask, st8.poses)
        fetch(stf8)
        results["n_matches"] = int(np.asarray(jnp.sum(stf8.valid)))
        log(f"matches: {results['n_matches']}")

        @jax.jit
        def setup(poses, stf):
            problem = build_problem(poses, st8.constraints)
            stf_s, run_last, run_start_pair = S.sort_factors_by_pair(stf, P)
            cidx, cbi, cbj, _ = S.compact_pair_rows(stf_s, run_last, P,
                                                    max_pairs=16384)
            red = S._pcg_reductions(stf_s, run_start_pair,
                                    (cidx, cbi, cbj), P)
            return problem, stf_s, red

        problem, stf_s, red = setup(st8.poses, stf8)
        fetch(red["cbi"])

        @jax.jit
        def assemble(x, stf_s, red):
            D, U, g, _ = normal_equations(problem, x)
            Dh, gh, _, B = S._stf_system_compact(stf_s, x, red)
            return D + Dh, U, g + gh, B

        ms, ss, sys0 = timed(
            assemble, st8.poses, stf_s, red,
            perturb=lambda k: (st8.poses + 1e-6 * (k + 1), stf_s, red))
        D_aug, U, g_tot, B = sys0
        results["s1_assemble_ms"] = round(ms, 1)
        log(f"s1 assemble_all: {ms:.1f} ms {ss}")

        @jax.jit
        def cost_only(x, stf_s):
            from hitl_slam_tpu.solver.joint import cost as chain_cost
            c = chain_cost(problem, x)
            r = C.stf_residuals(stf_s, x)
            return c + 0.5 * jnp.sum(r * r)

        ms, ss, _ = timed(
            cost_only, st8.poses, stf_s,
            perturb=lambda k: (st8.poses + 1e-6 * (k + 1), stf_s))
        results["s2_cost_only_ms"] = round(ms, 2)
        log(f"s2 cost_only: {ms:.2f} ms {ss}")

        bs = jax.jit(bcr_solve)
        ms, ss, _ = timed(
            bs, D_aug, U, g_tot,
            perturb=lambda k: (D_aug, U, g_tot + 1e-6 * (k + 1)))
        results["s3_bcr_apply_ms"] = round(ms, 2)
        log(f"s3 bcr apply: {ms:.2f} ms {ss}")

        for tol in (1e-5, 1e-2):
            @jax.jit
            def pcg_run(D, U, g, B, red, tol=tol):
                mv = S._pair_block_matvec(B, red, P)
                return pcg_solve(D, U, -g, extra_matvec=mv,
                                 max_iterations=64, tolerance=tol,
                                 preconditioner="tridiag")

            ms, ss, out = timed(
                pcg_run, D_aug, U, g_tot, B, red,
                perturb=lambda k: (D_aug, U, g_tot + 1e-6 * (k + 1), B,
                                   red))
            it = int(np.asarray(out[2]))
            results[f"s4_pcg_tol{tol:g}_ms"] = round(ms, 1)
            results[f"s4_pcg_tol{tol:g}_iters"] = it
            log(f"s4 pcg tol={tol:g}: {ms:.1f} ms, {it} cg iters {ss}")

        cfg5 = LMConfig(max_iterations=5)
        cfg3 = LMConfig(max_iterations=3)
        for tag, cfg, tol in (("tol1e-5_it5", cfg5, 1e-5),
                              ("tol1e-2_it5", cfg5, 1e-2),
                              ("tol5e-2_it5", cfg5, 5e-2),
                              ("tol1e-2_it3", cfg3, 1e-2)):
            if left() < 8 * 60:
                raise TimeoutError("budget")
            ms, ss, out = timed(
                lambda p, tbl, stf, cfg=cfg, tol=tol: S.stf_pcg_lm_solve(
                    p, tbl, stf, config=cfg, max_pairs=16384,
                    precondition="tridiag", cg_tolerance=tol),
                st8.poses, st8.constraints, stf8,
                perturb=lambda k: (st8.poses + 1e-6 * (k + 1),
                                   st8.constraints, stf8))
            r = dict(lm_ms=round(ms, 1),
                     samples=[round(s, 1) for s in ss],
                     final_cost=float(np.asarray(out.final_cost)),
                     iterations=int(np.asarray(out.iterations)))
            results[f"s5_{tag}"] = r
            log(f"s5 {tag}: {r}")
    except Exception as e:
        log(f"solve section skipped/partial: {e!r}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
