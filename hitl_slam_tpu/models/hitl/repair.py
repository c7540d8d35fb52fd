"""The fused device-side repair step: explicit correction -> new constraint
rows -> covariance backprop -> angle normalization -> joint LM solve.

This is the reference's entire post-EM correction cycle
(HitLSLAM.cpp:379-484: AppExpCorrect::Run -> Backprop::Run -> angle wrap ->
JointOpt::Run) compiled as ONE XLA program. All data-dependent quantities
(correction type, pose index sets, backprop bounds, constraint-table write
offset) are traced scalars/arrays with static shapes, so a session compiles
exactly once per map size and runs every subsequent correction with zero
retrace.

New constraint rows are scattered into the fixed-capacity ConstraintTable on
device at `write_offset` (slot indices via cumsum over the valid-pair mask;
invalid pairs land in a sacrificial slot past the live region... capacity - 1
is reserved as the dump slot and always kept inactive).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ...core.state import ConstraintTable
from ...ops.geometry import angle_mod
from ...solver.joint import build_problem
from ...solver.lm import LMConfig, LMResult, solve as lm_solve
from .backprop import backprop
from .explicit import apply_explicit, constraint_deltas

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RepairOutput:
    poses: Array
    covariances: Array
    constraints: ConstraintTable
    num_new_constraints: Array   # scalar int32
    lm: LMResult
    correction: Array            # [3] explicit-stage correction fed to backprop
    pre_solve_poses: Array       # [P,3] post-backprop, pre-LM poses (the
                                 # state the joint solve starts from)


def _scatter_constraints(
    table: ConstraintTable,
    ctype: Array,
    anchor_idx: Array,
    corr_idx: Array,
    dpar: Array,
    dperp: Array,
    dth: Array,
    pen: Array,
    valid: Array,
    write_offset: Array,
) -> tuple[ConstraintTable, Array]:
    cap = table.capacity
    v = valid.reshape(-1)
    slots = write_offset + jnp.cumsum(v) - 1
    slots = jnp.where(v, jnp.clip(slots, 0, cap - 1), cap - 1)

    MA, MC = valid.shape
    a_grid = jnp.broadcast_to(anchor_idx[:, None], (MA, MC)).reshape(-1)
    c_grid = jnp.broadcast_to(corr_idx[None, :], (MA, MC)).reshape(-1)

    new = ConstraintTable(
        ctype=table.ctype.at[slots].set(
            jnp.where(v, ctype, table.ctype[slots])),
        constrained=table.constrained.at[slots].set(
            jnp.where(v, c_grid, table.constrained[slots])),
        anchor=table.anchor.at[slots].set(
            jnp.where(v, a_grid, table.anchor[slots])),
        delta_parallel=table.delta_parallel.at[slots].set(
            jnp.where(v, dpar.reshape(-1), table.delta_parallel[slots])),
        delta_perpendicular=table.delta_perpendicular.at[slots].set(
            jnp.where(v, dperp.reshape(-1), table.delta_perpendicular[slots])),
        delta_angle=table.delta_angle.at[slots].set(
            jnp.where(v, dth.reshape(-1), table.delta_angle[slots])),
        penalty_dir=table.penalty_dir.at[slots].set(
            jnp.where(v, pen.reshape(-1), table.penalty_dir[slots])),
        active=table.active.at[slots].set(
            jnp.where(v, True, table.active[slots])),
    )
    # dump slot stays dead
    new = ConstraintTable(
        ctype=new.ctype, constrained=new.constrained, anchor=new.anchor,
        delta_parallel=new.delta_parallel,
        delta_perpendicular=new.delta_perpendicular,
        delta_angle=new.delta_angle, penalty_dir=new.penalty_dir,
        active=new.active.at[cap - 1].set(False),
    )
    return new, jnp.sum(v).astype(jnp.int32)


@partial(jax.jit, static_argnames=("lm_config",))
def repair_step(
    poses: Array,
    covariances: Array,
    constraints: ConstraintTable,
    ctype: Array,          # scalar int32 CorrectionType
    sel: Array,            # [4,2] refit + reordered selected points
    group_mask: Array,     # [P] bool, first contiguous corrected group
    last_pose: Array,      # scalar int32
    anchor_idx: Array,     # [MA] int32 (pad -1)
    corr_idx: Array,       # [MC] int32 (pad -1)
    bp_min: Array,         # scalar int32
    bp_max: Array,         # scalar int32
    write_offset: Array,   # scalar int32, next free constraint slot
    lm_config: LMConfig = LMConfig(),
) -> RepairOutput:
    # 1. explicit rigid correction (+ tail carry)
    poses1, C = apply_explicit(poses, ctype, sel, group_mask, last_pose)

    # 2. durable constraint targets from the post-explicit poses
    dpar, dperp, dth, pen, valid = constraint_deltas(
        poses1, sel, anchor_idx, corr_idx
    )
    table, n_new = _scatter_constraints(
        constraints, ctype, anchor_idx, corr_idx,
        dpar, dperp, dth, pen, valid, write_offset,
    )

    # 3. covariance-weighted backprop over the open window
    poses2, cov2 = backprop(poses1, covariances, C, bp_min, bp_max)

    # 4. wrap all angles into (-pi, pi] (HitLSLAM.cpp:443-447)
    poses2 = poses2.at[:, 2].set(angle_mod(poses2[:, 2]))

    # 5. joint LM solve over odometry + all human factors
    problem = build_problem(poses2, table)
    lm = lm_solve(problem, poses2, lm_config)
    # CopyParams applies angle_mod on write-back (JointOptimization.cpp:380-390)
    poses3_final = lm.poses.at[:, 2].set(angle_mod(lm.poses[:, 2]))

    return RepairOutput(
        poses=poses3_final,
        covariances=cov2,
        constraints=table,
        num_new_constraints=n_new,
        lm=lm,
        correction=C,
        pre_solve_poses=poses2,
    )
