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

    `human_onehot` ([C, P] f32 or None) caches the constraint->pose scatter
    as a dense selector so per-iteration assembly is a single MXU
    contraction instead of a serialized TPU scatter-add; it is constant for
    the duration of a solve, so it is built once here.
    """

    odom: res.OdometryFactors
    human: res.HumanFactors
    human_onehot: Array | None = None
    num_poses: int = dataclasses.field(metadata=dict(static=True), default=0)


# max elements of the dense [C, P] selector before falling back to scatter
ONEHOT_BUDGET = 32 * 1024 * 1024


def build_problem(poses: Array, table: ConstraintTable,
                  use_onehot: bool = True) -> JointProblem:
    P = poses.shape[0]
    human = res.build_human_factors(poses, table)
    C = human.pose_idx.shape[0]
    onehot = None
    # callers that vmap over replicas should pass use_onehot=False: the
    # selector is per-example, so a batch multiplies its footprint
    if use_onehot and P * C <= ONEHOT_BUDGET:
        onehot = (
            human.pose_idx[:, None] == jnp.arange(P)[None, :]
        ).astype(poses.dtype)
    return JointProblem(
        odom=res.build_odometry_factors(poses),
        human=human,
        human_onehot=onehot,
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
    r_h = res.human_residuals(problem.human, poses)
    return 0.5 * (jnp.sum(r_o * r_o) + jnp.sum(r_h * r_h))


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
    r_h = res.human_residuals(problem.human, poses)          # [C,3]
    Jh = res.human_jacobians(problem.human)                  # [C,3,3]

    J1T, J2T = jnp.swapaxes(J1, -1, -2), jnp.swapaxes(J2, -1, -2)
    D = jnp.zeros((P, 3, 3), poses.dtype)
    D = D.at[:-1].add(J1T @ J1)
    D = D.at[1:].add(J2T @ J2)
    U = J1T @ J2                                             # couples (i-1, i)

    g = jnp.zeros((P, 3), poses.dtype)
    g = g.at[:-1].add((J1T @ r_o[..., None])[..., 0])
    g = g.at[1:].add((J2T @ r_o[..., None])[..., 0])

    JhT = jnp.swapaxes(Jh, -1, -2)
    D_h = JhT @ Jh                                           # [C,3,3]
    g_h = (JhT @ r_h[..., None])[..., 0]                     # [C,3]
    if problem.human_onehot is not None:
        # TPU scatter-add serializes on colliding indices (~4 ms/iteration at
        # C=8k, measured); the cached one-hot contraction puts the same
        # reduction on the MXU.
        D = D + jnp.einsum("cp,cij->pij", problem.human_onehot, D_h)
        g = g + jnp.einsum("cp,ci->pi", problem.human_onehot, g_h)
    else:
        D = D.at[problem.human.pose_idx].add(D_h)
        g = g.at[problem.human.pose_idx].add(g_h)

    # gauge fix pose 0
    eye = jnp.eye(3, dtype=poses.dtype)
    D = D.at[0].set(eye)
    U = U.at[0].set(0.0)
    g = g.at[0].set(0.0)

    c = 0.5 * (jnp.sum(r_o * r_o) + jnp.sum(r_h * r_h))
    return D, U, g, c
