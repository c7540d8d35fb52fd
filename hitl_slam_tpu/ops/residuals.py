"""Factor residuals + analytic Jacobians for the joint pose-graph solve.

Reimplements the *active* residual set of the reference's Ceres problem
(residual_functors.h:1054-1133 PoseConstraint; :1299-1415 the four
human-imposed constraints) as batched, mask-friendly array programs with
hand-derived Jacobians — no autodiff in the hot path, every factor type
evaluated for all factors at once on the VPU.

Key semantic points preserved from the reference:
  - Odometry factor constants (axis transform, radial translation, relative
    rotation) are computed from the CURRENT poses when the problem is built
    (JointOptimization.cpp:736-825), with hardcoded sigmas
    radial/tangential=0.03, angular=0.01 and an atan2-wrapped angular error.
  - Human factors are UNARY: the target pose is recomputed from the anchor
    pose at problem build time, and only the constrained pose's parameters
    enter the residual (JointOptimization.cpp:969-1054). All four types are
    expressed here as one parametric form  r = M (q_target - q)  with a
    type-dependent 3x3 row-selector M, so a single batched kernel covers
    colocation (M=I), colinear, perpendicular, and parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..core.state import ConstraintTable, CorrectionType
from .geometry import angle_mod, rotate

Array = jax.Array

# Hardcoded odometry noise model, as in JointOptimization.cpp:770-789.
ODOM_RADIAL_STD = 0.03
ODOM_TANGENTIAL_STD = 0.03
ODOM_ANGULAR_STD = 0.01
_EPS = 1e-6


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class OdometryFactors:
    """Fixed per-factor constants for the P-1 chain factors (i-1, i)."""

    axis: Array      # [F, 2, 2] rows = (radial, tangential) directions
    radial: Array    # [F] radial translation target
    rotation: Array  # [F] relative rotation target
    inv_sigma: Array  # [F, 3] 1/std for (radial, tangential, angular)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HumanFactors:
    """Unary human factors in unified form r = M (q_target - q)."""

    pose_idx: Array  # [C] int32 constrained pose
    M: Array         # [C, 3, 3] row-selector / direction matrix
    target: Array    # [C, 3] target (x, y, theta)
    active: Array    # [C] bool


def build_odometry_factors(poses: Array,
                           inv_sigma: Array | None = None) -> OdometryFactors:
    """Compute factor constants from current poses, vectorized over the chain.

    Mirrors AddOdometryConstraints (JointOptimization.cpp:736-825): radial
    direction is the unit relative translation in pose i-1's frame, or the
    pose-i heading when the motion is ~zero; rotation target is the wrapped
    relative angle.

    `inv_sigma` overrides the hardcoded noise model with PER-FACTOR [F, 3]
    inverse stddevs — the EnML loop-closure path weights each chain factor
    by the pose covariance ellipse instead (VectorMapping::AddLoopConstraint,
    vector_mapping.cpp:450-617; see models/enml/session.loop_inv_sigmas).
    """
    p0, p1 = poses[:-1], poses[1:]
    trans = p1[:, :2] - p0[:, :2]
    norm = jnp.linalg.norm(trans, axis=-1)
    degenerate = (jnp.abs(trans[:, 0]) < _EPS) & (jnp.abs(trans[:, 1]) < _EPS)

    local = rotate(-p0[:, 2], trans)
    radial_moving = local / jnp.maximum(norm, _EPS)[:, None]
    radial_still = jnp.stack([jnp.cos(p1[:, 2]), jnp.sin(p1[:, 2])], -1)
    radial_dir = jnp.where(degenerate[:, None], radial_still, radial_moving)
    tangential_dir = jnp.stack([-radial_dir[:, 1], radial_dir[:, 0]], -1)

    axis = jnp.stack([radial_dir, tangential_dir], axis=-2)  # rows
    radial = jnp.where(degenerate, 0.0, norm)
    rotation = angle_mod(p1[:, 2] - p0[:, 2])
    if inv_sigma is None:
        inv_sigma = jnp.broadcast_to(jnp.array(
            [1.0 / ODOM_RADIAL_STD, 1.0 / ODOM_TANGENTIAL_STD,
             1.0 / ODOM_ANGULAR_STD], poses.dtype), (axis.shape[0], 3))
    else:
        inv_sigma = jnp.asarray(inv_sigma, poses.dtype)
    return OdometryFactors(axis=axis, radial=radial, rotation=rotation,
                           inv_sigma=inv_sigma)


def odometry_residuals(f: OdometryFactors, poses: Array) -> Array:
    """[F, 3] residuals of all chain factors at `poses`.

    r0 = (axis.row0 . R(-th1) dt - radial) / sr
    r1 = (axis.row1 . R(-th1) dt) / st
    r2 = wrap(th2 - th1 - rotation) / sa
    """
    p0, p1 = poses[:-1], poses[1:]
    v = rotate(-p0[:, 2], p1[:, :2] - p0[:, :2])
    u = jnp.einsum("fij,fj->fi", f.axis, v)
    r0 = (u[:, 0] - f.radial) * f.inv_sigma[:, 0]
    r1 = u[:, 1] * f.inv_sigma[:, 1]
    r2 = angle_mod(p1[:, 2] - p0[:, 2] - f.rotation) * f.inv_sigma[:, 2]
    return jnp.stack([r0, r1, r2], axis=-1)


def odometry_jacobians(f: OdometryFactors, poses: Array) -> tuple[Array, Array]:
    """Analytic Jacobians (J1 wrt pose i-1, J2 wrt pose i), each [F, 3, 3].

    d(R(-th1) dt)/dth1 = (v_y, -v_x); the wrapped angular residual has unit
    slope away from the wrap cliff.
    """
    p0, p1 = poses[:-1], poses[1:]
    dt = p1[:, :2] - p0[:, :2]
    v = rotate(-p0[:, 2], dt)
    B = f.axis * f.inv_sigma[:, :2, None]             # scaled rows [F,2,2]
    ARot = jnp.einsum("fij,fjk->fik", B, _rot_neg(p0[:, 2]))  # [F,2,2]
    dv_dth1 = jnp.stack([v[:, 1], -v[:, 0]], -1)       # [F,2]
    du_dth1 = jnp.einsum("fij,fj->fi", B, dv_dth1)     # [F,2]

    zeros = jnp.zeros_like(f.radial)
    isa = f.inv_sigma[:, 2]

    # J2 rows: [ARot | 0], [..], [0, 0, 1/sa]
    J2 = jnp.concatenate(
        [
            jnp.concatenate([ARot, jnp.zeros_like(du_dth1)[..., None]], -1),
            jnp.stack([zeros, zeros, isa], -1)[:, None, :],
        ],
        axis=1,
    )
    J1 = jnp.concatenate(
        [
            jnp.concatenate([-ARot, du_dth1[..., None]], -1),
            jnp.stack([zeros, zeros, -isa], -1)[:, None, :],
        ],
        axis=1,
    )
    return J1, J2


def _rot_neg(theta: Array) -> Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], axis=-2
    )


def build_human_factors(poses: Array, table: ConstraintTable) -> HumanFactors:
    """Instantiate all human factors from the constraint table at the current
    anchor poses (targets fixed for the duration of one solve, matching
    AddHumanConstraints, JointOptimization.cpp:969-1054).

    Unified form:
      colocation    M = I
      colinear      M rows = [(cos pd, sin pd, 0), (0,0,1), 0]
      perpendicular M rows = [(0,0,1), 0, 0]
      parallel      M rows = [(0,0,1), 0, 0]
    with target = (anchor_loc + dpar*para + dperp*perp, wrap(anchor_th + dth)).
    """
    a = table.anchor
    anchor = poses[a]                     # [C, 3]
    ath = anchor[:, 2]
    para = jnp.stack([jnp.cos(ath), jnp.sin(ath)], -1)
    perp_d = jnp.stack([-para[:, 1], para[:, 0]], -1)
    target_loc = (
        anchor[:, :2]
        + table.delta_parallel[:, None] * para
        + table.delta_perpendicular[:, None] * perp_d
    )
    target_angle = angle_mod(ath + table.delta_angle)
    target = jnp.concatenate([target_loc, target_angle[:, None]], -1)

    pd = ath + table.penalty_dir
    cpd, spd = jnp.cos(pd), jnp.sin(pd)
    zeros = jnp.zeros_like(cpd)
    ones = jnp.ones_like(cpd)

    t = table.ctype
    # CORNER (declared-unsupported in the reference) constrains the full
    # pose like colocation; POINT constrains position only (a point pair
    # fixes no rotation).
    is_coloc = (t == int(CorrectionType.LINE_SEGMENT)) | (
        t == int(CorrectionType.CORNER))
    is_point = t == int(CorrectionType.POINT)
    is_colin = t == int(CorrectionType.COLINEAR)
    is_angle_only = (t == int(CorrectionType.PERPENDICULAR)) | (
        t == int(CorrectionType.PARALLEL)
    )

    def rows(r0, r1, r2):
        return jnp.stack([jnp.stack(r0, -1), jnp.stack(r1, -1),
                          jnp.stack(r2, -1)], axis=-2)

    M_coloc = rows((ones, zeros, zeros), (zeros, ones, zeros), (zeros, zeros, ones))
    M_point = rows((ones, zeros, zeros), (zeros, ones, zeros), (zeros, zeros, zeros))
    M_colin = rows((cpd, spd, zeros), (zeros, zeros, ones), (zeros, zeros, zeros))
    M_angle = rows((zeros, zeros, ones), (zeros, zeros, zeros), (zeros, zeros, zeros))

    M = jnp.where(is_coloc[:, None, None], M_coloc,
                  jnp.where(is_point[:, None, None], M_point,
                            jnp.where(is_colin[:, None, None], M_colin,
                                      jnp.where(is_angle_only[:, None, None],
                                                M_angle, 0.0))))
    M = M * table.active[:, None, None]
    return HumanFactors(pose_idx=table.constrained, M=M, target=target,
                        active=table.active)


def human_residuals(f: HumanFactors, poses: Array) -> Array:
    """[C, 3] residuals r = M (target - q_constrained); inactive rows are 0."""
    q = poses[f.pose_idx]
    return jnp.einsum("cij,cj->ci", f.M, f.target - q)


def human_jacobians(f: HumanFactors) -> Array:
    """[C, 3, 3] Jacobian wrt the constrained pose: J = -M (constant)."""
    return -f.M


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RelativePoseFactors:
    """Chained relative-pose factors — the reference's dormant
    RelativePoseConstraint (residual_functors.h:944-1035): the problem is
    parameterized by a BASE pose plus per-step relative (dx, dy, dtheta)
    triples; absolute poses are their running sums (the reference's
    DynamicAutoDiff loops :987-996 compose ADDITIVELY, not on SE(2) — kept).
    Each factor constrains the pair (pose0, pose1) of the summed chain with
    the same radial/tangential/angular error as PoseConstraint, except the
    angular residual is the RAW difference (no atan2 wrap, :1014-1021)."""

    pose0: Array      # [K] int32
    pose1: Array      # [K] int32
    axis: Array       # [K, 2, 2] principal-axis transform rows
    radial: Array     # [K] radial translation target
    rotation: Array   # [K] rotation target
    inv_sigma: Array  # [K, 3]


def chain_poses(base_pose: Array, rels: Array) -> Array:
    """[3], [P-1, 3] -> [P, 3] absolute poses by prefix sum (the additive
    composition of residual_functors.h:987-996 as one cumsum)."""
    steps = jnp.concatenate([base_pose[None], rels], axis=0)
    return jnp.cumsum(steps, axis=0)


def build_relative_pose_factors(
    poses: Array, pose0: Array, pose1: Array,
    radial_std: float = ODOM_RADIAL_STD,
    tangential_std: float = ODOM_TANGENTIAL_STD,
    angular_std: float = ODOM_ANGULAR_STD,
) -> RelativePoseFactors:
    """Factor constants from current absolute poses for arbitrary (pose0,
    pose1) pairs — the chained-relative analog of build_odometry_factors."""
    p0, p1 = poses[pose0], poses[pose1]
    trans = p1[:, :2] - p0[:, :2]
    norm = jnp.linalg.norm(trans, axis=-1)
    degenerate = norm < _EPS
    local = rotate(-p0[:, 2], trans)
    radial_dir = jnp.where(
        degenerate[:, None],
        jnp.stack([jnp.cos(p1[:, 2]), jnp.sin(p1[:, 2])], -1),
        local / jnp.maximum(norm, _EPS)[:, None])
    axis = jnp.stack([radial_dir, perp_rows(radial_dir)], axis=-2)
    inv_sigma = jnp.broadcast_to(
        jnp.array([1.0 / radial_std, 1.0 / tangential_std,
                   1.0 / angular_std], poses.dtype), (len(p0), 3))
    return RelativePoseFactors(
        pose0=pose0, pose1=pose1, axis=axis,
        radial=jnp.where(degenerate, 0.0, norm),
        rotation=p1[:, 2] - p0[:, 2],
        inv_sigma=inv_sigma,
    )


def perp_rows(v: Array) -> Array:
    return jnp.stack([-v[..., 1], v[..., 0]], -1)


def relative_pose_residuals(
    f: RelativePoseFactors, base_pose: Array, rels: Array
) -> Array:
    """[K, 3] residuals over the relative-pose parameterization. Depends on
    every rel up to each factor's poses (through the prefix sum) — jax
    autodiff supplies the chain Jacobian where the reference used
    DynamicAutoDiffCostFunction."""
    poses = chain_poses(base_pose, rels)
    p0, p1 = poses[f.pose0], poses[f.pose1]
    t = rotate(-p0[:, 2], p1[:, :2] - p0[:, :2])
    u = jnp.einsum("kij,kj->ki", f.axis, t)
    r0 = (u[:, 0] - f.radial) * f.inv_sigma[:, 0]
    r1 = u[:, 1] * f.inv_sigma[:, 1]
    # raw (unwrapped) angular difference, as in the reference (:1014-1021)
    r2 = (p1[:, 2] - p0[:, 2] - f.rotation) * f.inv_sigma[:, 2]
    return jnp.stack([r0, r1, r2], axis=-1)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CompactHuman:
    """Per-pose pre-reduction of the human-constraint table.

    Because every human factor is UNARY with per-solve-constant M and target
    (targets are recomputed from anchors only at problem build time,
    JointOptimization.cpp:969-1054), the whole [C]-row table reduces EXACTLY
    to per-pose quadratic forms once per solve. Writing the residual about
    the build-time poses q0 (r_a = d_a + M_a e with d_a = M_a(t_a - q0),
    e = q0 - q keeps f32 cancellation mild — both d and e are step-sized):

        A_p = sum_a M_a^T M_a          (Hessian block, constant per solve)
        c_p = sum_a M_a^T d_a          (gradient offset)
        k   = sum_a d_a^T d_a          (cost offset, scalar)

        H_h[p]    = A_p
        g_h[p]    = -(c_p + A_p e_p)
        cost_h    = 0.5 (k + sum_p 2 e_p.c_p + e_p.A_p e_p)

    This removes the per-LM-iteration [C,P] contraction entirely: iteration
    cost for human factors is O(P) instead of O(C*P), and is independent of
    the constraint-table capacity.
    """

    q0: Array  # [P, 3] build-time poses (linearization reference)
    A: Array   # [P, 3, 3]
    c: Array   # [P, 3]
    k: Array   # scalar


def compact_human_factors(
    f: HumanFactors, poses0: Array, onehot: Array | None = None
) -> CompactHuman:
    """Reduce the [C]-row factor table to CompactHuman at poses0.

    With `onehot` ([C, P]) the reduction rides the MXU (TPU scatter-add
    serializes on colliding indices); without it (e.g. under vmap over
    replicas, where a per-example selector would multiply the footprint) it
    falls back to scatter-add — either way this runs ONCE per solve.
    """
    P = poses0.shape[0]
    d = jnp.einsum("cij,cj->ci", f.M, f.target - poses0[f.pose_idx])  # [C,3]
    MTM = jnp.einsum("cki,ckj->cij", f.M, f.M)                        # [C,3,3]
    MTd = jnp.einsum("cki,ck->ci", f.M, d)                            # [C,3]
    if onehot is not None:
        A = jnp.einsum("cp,cij->pij", onehot, MTM)
        c = jnp.einsum("cp,ci->pi", onehot, MTd)
    else:
        A = jnp.zeros((P, 3, 3), poses0.dtype).at[f.pose_idx].add(MTM)
        c = jnp.zeros((P, 3), poses0.dtype).at[f.pose_idx].add(MTd)
    k = jnp.sum(d * d)
    return CompactHuman(q0=poses0, A=A, c=c, k=k)


def compact_human_terms(
    ch: CompactHuman, poses: Array
) -> tuple[Array, Array, Array]:
    """(H_blocks [P,3,3], g [P,3], cost scalar) of all human factors at
    `poses`, from the per-pose pre-reduction. Exact (up to f32 reassociation)
    equal to assembling the [C]-row table."""
    e = ch.q0 - poses
    Ae = jnp.einsum("pij,pj->pi", ch.A, e)
    g = -(ch.c + Ae)
    cost = 0.5 * (ch.k + jnp.sum(e * (2.0 * ch.c + Ae)))
    return ch.A, g, cost
