"""The fully-fused correction cycle: ONE device program per correction.

verify -> world transform -> EM endpoint refit -> inlier counts -> ordering ->
explicit correction -> constraint instantiation -> backprop -> joint LM solve,
with zero host round trips in between (the reference's entire 'p'-key path,
SURVEY.md section 3.2). The host passes raw clicked points and gets back the
repaired state plus a small stats bundle; invalid/unverified inputs gate the
state update on device (outputs == inputs), mirroring the reference's early
returns (HitLSLAM.cpp:379-484).

This fusion exists for a hardware reason: each host<->device sync over the
TPU tunnel costs ~30-80 ms — more than the entire solve. One program, one
sync.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...core.state import ConstraintTable
from ...ops.geometry import angle_mod, pose_to_world
from ...solver.joint import build_problem
from ...solver.lm import LMConfig, solve as lm_solve
from . import em_input
from .backprop import backprop
from .explicit import apply_explicit, constraint_deltas
from .ordering import order_on_device
from .repair import _scatter_constraints

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CycleOutput:
    poses: Array
    covariances: Array
    constraints: ConstraintTable
    verified: Array             # scalar bool — all clicked points near map
    order_valid: Array          # scalar bool — ordering/backprop bounds OK
    num_new_constraints: Array  # scalar int32
    refit_sel: Array            # [4,2] EM-refit (and possibly swapped) points
    lm_iterations: Array
    lm_initial_cost: Array
    lm_final_cost: Array
    pre_solve_poses: Array


@partial(jax.jit, static_argnames=("lm_config",))
def cycle_step(
    points: Array,        # [P,N,2] robot frame
    point_mask: Array,    # [P,N]
    poses: Array,         # [P,3]
    covariances: Array,   # [P,3,3]
    constraints: ConstraintTable,
    ctype: Array,         # scalar int32
    sel_raw: Array,       # [4,2] clicked points, world frame
    write_offset: Array,  # scalar int32
    lm_config: LMConfig = LMConfig(),
) -> CycleOutput:
    from ...ops.pallas_em import em_scan

    world = pose_to_world(poses[:, None, :], points)

    from ...core.state import CorrectionType

    # POINT selections are degenerate segments [p,p,q,q]; CORNER drags are
    # anchored at a feature vertex — neither gets the segment refit
    is_point = ctype == int(CorrectionType.POINT)
    is_corner = ctype == int(CorrectionType.CORNER)

    # --- verification (HitLSLAM::verifyUserInput) — Pallas sweep ---
    _, min_d2 = em_scan(world, point_mask, sel_raw)
    degenerate = jnp.all(sel_raw[0] == sel_raw[1]) | jnp.all(
        sel_raw[2] == sel_raw[3]
    )
    verified = jnp.all(min_d2 < em_input.VERIFY_THRESHOLD**2) & (
        ~degenerate | is_point)

    # --- EM: refit both sketched segments in ONE batched while_loop, count
    # inliers (Pallas sweep) ---
    segs = em_input.endpoint_adjust_batch(
        world, point_mask, jnp.stack([sel_raw[0:2], sel_raw[2:4]]))
    refit = segs.reshape(4, 2)
    refit = jnp.where(is_point | is_corner, sel_raw, refit)
    # POINT selections count inliers in the wider verify-radius disc (a
    # point pill starves the observation sets on sparse scans); lax.cond
    # keeps the extra sweep off the hot path for segment corrections
    counts, _ = lax.cond(
        is_point,
        lambda: em_scan(world, point_mask, refit,
                        inlier_threshold=em_input.VERIFY_THRESHOLD),
        lambda: em_scan(world, point_mask, refit),
    )
    c1, c2 = counts[:, 0], counts[:, 1]

    # --- ordering / filtering on device ---
    from .ordering import MIN_POSE_INLIERS

    o = order_on_device(c1, c2, refit,
                        min_inliers=jnp.where(is_point, 0,
                                              MIN_POSE_INLIERS))
    valid = verified & o.valid

    # --- explicit correction + constraint targets ---
    poses1, C = apply_explicit(poses, ctype, o.sel, o.group_mask, o.last_pose)
    dpar, dperp, dth, pen, pair_valid = constraint_deltas(
        poses1, o.sel, o.anchor_idx, o.corrected_idx
    )
    table, n_new = _scatter_constraints(
        constraints, ctype, o.anchor_idx, o.corrected_idx,
        dpar, dperp, dth, pen, pair_valid & valid, write_offset,
    )

    # --- backprop + angle wrap ---
    poses2, cov2 = backprop(poses1, covariances, C, o.bp_min, o.bp_max)
    poses2 = poses2.at[:, 2].set(angle_mod(poses2[:, 2]))

    # --- joint LM solve over odometry + all human factors ---
    problem = build_problem(poses2, table)
    lm = lm_solve(problem, poses2, lm_config)
    poses3 = lm.poses.at[:, 2].set(angle_mod(lm.poses[:, 2]))

    # --- gate the state update on validity ---
    vq = valid
    return CycleOutput(
        poses=jnp.where(vq, poses3, poses),
        covariances=jnp.where(vq, cov2, covariances),
        constraints=table,
        verified=verified,
        order_valid=o.valid,
        num_new_constraints=jnp.where(vq, n_new, 0),
        refit_sel=o.sel,
        lm_iterations=jnp.where(vq, lm.iterations, 0),
        lm_initial_cost=lm.initial_cost,
        lm_final_cost=lm.final_cost,
        pre_solve_poses=poses2,
    )
