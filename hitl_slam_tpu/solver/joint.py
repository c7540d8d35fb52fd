"""Joint pose-graph problem: assembly of the block-tridiagonal normal
equations from odometry + human factors, plus cost evaluation.

This is the device-side replacement for the reference's Ceres problem build
(JointOptimization.cpp AddOdometryConstraints :736-825, AddHumanConstraints
:969-1054, SolveHumanConstraints :1064-1138). The first pose is gauge-fixed
(problem->SetParameterBlockConstant(&pose_array_[0]), :824) by zeroing its
couplings and pinning its diagonal block to identity.

Cost convention matches Ceres: total cost = 0.5 * sum(r_i^2).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.state import ConstraintTable
from ..ops import residuals as res

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class JointProblem:
    """All factor constants for one solve, fixed at build time.

    `compact` is the once-per-solve per-pose reduction of the human factor
    table (ops/residuals.py:CompactHuman): the [C]-row table never enters
    the LM iteration loop — per-iteration human-factor work is O(P) and
    independent of constraint-table capacity. `human` keeps the raw per-row
    factors for cost breakdowns and the sharded sequence-parallel solver.
    """

    odom: res.OdometryFactors
    human: res.HumanFactors
    compact: res.CompactHuman
    num_poses: int = dataclasses.field(metadata=dict(static=True), default=0)


# max elements of the dense [C, P] selector before falling back to scatter
ONEHOT_BUDGET = 64 * 1024 * 1024


def build_problem(poses: Array, table: ConstraintTable,
                  use_onehot: bool = True,
                  odom_inv_sigma: Array | None = None) -> JointProblem:
    """`odom_inv_sigma` [P-1, 3] overrides the hardcoded odometry noise with
    per-factor inverse stddevs (the EnML loop-closure covariance weighting,
    AddLoopConstraint vector_mapping.cpp:450-617)."""
    P = poses.shape[0]
    human = res.build_human_factors(poses, table)
    C = human.pose_idx.shape[0]
    onehot = None
    # The dense selector puts the once-per-solve table->pose reduction on the
    # MXU (TPU scatter-add serializes on colliding indices). Callers that
    # vmap over replicas pass use_onehot=False: a per-example selector would
    # multiply the footprint, and the scatter runs once per solve anyway.
    if use_onehot and P * C <= ONEHOT_BUDGET:
        onehot = (
            human.pose_idx[:, None] == jnp.arange(P)[None, :]
        ).astype(poses.dtype)
    return JointProblem(
        odom=res.build_odometry_factors(poses, odom_inv_sigma),
        human=human,
        compact=res.compact_human_factors(human, poses, onehot),
        num_poses=P,
    )


def cost(problem: JointProblem, poses: Array) -> Array:
    """0.5 * sum of squared residuals.

    XLA's tree reduction keeps the f32 sum accurate to ~eps*log(n), which is
    what makes the Ceres-style relative function tolerance usable at f32.
    (f64 is avoided: on the target TPU it is emulated and pathologically slow
    to compile.)
    """
    r_o = res.odometry_residuals(problem.odom, poses)
    _, _, c_h = res.compact_human_terms(problem.compact, poses)
    return 0.5 * jnp.sum(r_o * r_o) + c_h


def normal_equations(
    problem: JointProblem, poses: Array
) -> tuple[Array, Array, Array, Array]:
    """Assemble H (block-tridiag: D [P,3,3], U [P-1,3,3]), gradient g = J^T r
    [P,3], and the cost — one fused pass over all factors.

    Gauge fixing of pose 0: its row/col couplings are zeroed and D[0] = I,
    g[0] = 0, so the solve leaves pose 0 untouched.
    """
    P = problem.num_poses
    r_o = res.odometry_residuals(problem.odom, poses)        # [F,3]
    J1, J2 = res.odometry_jacobians(problem.odom, poses)     # [F,3,3] each

    J1T, J2T = jnp.swapaxes(J1, -1, -2), jnp.swapaxes(J2, -1, -2)
    # human factors enter via the per-pose pre-reduction: O(P) per iteration,
    # no [C]-row work in the LM loop (see ops/residuals.py:CompactHuman)
    A_h, g_h, c_h = res.compact_human_terms(problem.compact, poses)
    D = A_h.at[:-1].add(J1T @ J1)
    D = D.at[1:].add(J2T @ J2)
    U = J1T @ J2                                             # couples (i-1, i)

    g = g_h.at[:-1].add((J1T @ r_o[..., None])[..., 0])
    g = g.at[1:].add((J2T @ r_o[..., None])[..., 0])

    # gauge fix pose 0
    eye = jnp.eye(3, dtype=poses.dtype)
    D = D.at[0].set(eye)
    U = U.at[0].set(0.0)
    g = g.at[0].set(0.0)

    c = 0.5 * jnp.sum(r_o * r_o) + c_h
    return D, U, g, c
