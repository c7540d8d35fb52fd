"""Post-human STF refinement — the live version of the reference's dormant
PostHumanOptimization stage (JointOptimization.cpp:1156-1256, invocation
commented at :1353-1373).

One fused device program: world transform -> grid correspondence search ->
factor compaction -> dense GN/LM refine (odometry + human + STF factors).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax

from ...core.state import ConstraintTable
from ...ops import correspond as C
from ...ops.geometry import pose_to_world, rotate
from ...solver.lm import LMConfig
from ...solver.stf_solve import (STFSolveResult, stf_lm_solve,
                                 stf_pcg_lm_solve)

Array = jax.Array

# above this pose count the dense [3P,3P] refine Hessian (37 MB at P=1024,
# 2.4 GB at P=8192) gives way to the matrix-free PCG solve
DENSE_POSE_LIMIT = 2048


def match_factors_global(
    points: Array,
    normals: Array,
    point_mask: Array,
    poses: Array,
    capacity: int = 65536,
    bucket: int = 64,
    max_cells: int | None = None,
):
    """The global-1-NN correspondence half of the refine (world transform +
    grid_match + factor compaction). Shared by post_human_refine and the
    bench's stage decomposition so both always measure the same pipeline.
    Returns (STFFactors, Matches)."""
    world = pose_to_world(poses[:, None, :], points)
    world_nrm = rotate(poses[:, 2][:, None], normals)
    matches = C.grid_match(world, world_nrm, point_mask,
                           bucket=bucket, max_cells=max_cells)
    stf = C.build_stf_factors(points, normals, matches, capacity=capacity)
    return stf, matches


@partial(jax.jit, static_argnames=("capacity", "config", "include_chain",
                                   "solver", "matcher", "max_pairs",
                                   "match_bucket", "match_max_cells"))
def post_human_refine(
    points: Array,       # [P, N, 2] robot frame
    normals: Array,      # [P, N, 2]
    point_mask: Array,   # [P, N]
    poses: Array,        # [P, 3]
    table: ConstraintTable,
    capacity: int = 65536,
    config: LMConfig = LMConfig(max_iterations=30),
    include_chain: bool = True,
    solver: str = "auto",   # "dense" | "dense_fused" | "pcg" | "auto"
    matcher: str = "global",  # "global" (1-NN grid) | "pair" (per-pair NN)
    max_pairs: int = 8192,    # pair-matcher election capacity
    match_bucket: int = 64,   # grid per-cell capacity (density cap)
    match_max_cells: int | None = None,  # occupied-cell capacity; the
    # default clamp (M//32, max 16384) is sized for building-scale maps —
    # large-extent maps (perimeter >> 100 m) need it raised to avoid
    # counted cell drops
) -> STFSolveResult:
    """matcher="pair" selects the reference-faithful per-pair correspondence
    search (C.pair_match_factors) — required on heavily re-traversed maps
    where the global 1-NN fragments bundles below the reference's
    >=10-per-pair gate and would yield zero factors.

    Drop diagnostics on the result (ADVICE r2: capacity violations must be
    detectable): `match_dropped` counts factor rows genuinely lost
    (matcher-table overflow, or the global matcher's grid drops);
    `vote_dropped`/`elect_dropped` (pair mode) count stage-1 grid drops
    that may have silenced votes and voted pairs beyond the election
    capacity; `pairs_dropped` counts pose pairs beyond the solvers'
    off-diagonal compact capacity (kept >= max_pairs here, so 0 unless the
    global matcher emits more distinct pairs than that)."""
    vote_dropped = elect_dropped = None
    if matcher == "pair":
        stf, info = C.pair_match_factors(points, normals, point_mask, poses,
                                         max_pairs=max_pairs,
                                         capacity=capacity,
                                         bucket=match_bucket,
                                         max_cells=match_max_cells)
        match_dropped = info.rows_overflow
        vote_dropped = info.grid_dropped
        elect_dropped = info.pairs_overflow
    else:
        stf, matches = match_factors_global(points, normals, point_mask,
                                            poses, capacity=capacity,
                                            bucket=match_bucket,
                                            max_cells=match_max_cells)
        match_dropped = matches.dropped
    if solver == "auto":
        # dense_fused measured faster than dense at bench shapes (P=1024,
        # ~33k matches, 10 LM iters): 290.7 vs 300.5 ms end-to-end on TPU
        # (scripts/r3_tpu_measure2.py, device_get-forced) — the saved
        # factor pass on accepted steps outweighs assembly on rejects.
        solver = "pcg" if poses.shape[0] > DENSE_POSE_LIMIT else "dense_fused"
    # the solvers' off-diagonal pair compact must hold every pair the
    # matcher can emit — never smaller than the election capacity
    solver_pairs = max(max_pairs, 16384)
    if solver == "pcg":
        fn = partial(stf_pcg_lm_solve, max_pairs=solver_pairs)
    elif solver == "dense_fused":
        # single-factor-pass trial evaluation (see stf_lm_solve docstring)
        fn = partial(stf_lm_solve, fused_eval=True, max_pairs=solver_pairs)
    else:
        fn = partial(stf_lm_solve, max_pairs=solver_pairs)
    out = fn(poses, table, stf, config=config, include_chain=include_chain)
    return dataclasses.replace(out, match_dropped=match_dropped,
                               vote_dropped=vote_dropped,
                               elect_dropped=elect_dropped)
