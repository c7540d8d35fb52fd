"""Explicit rigid correction implied by the sketch pair, as pure array ops.

TPU redesign of AppExpCorrect (ApplyExplicitCorrection.cpp):

  - the per-type rigid transform (line-to-line :150-181, colinear :229-257,
    perpendicular :259-293, parallel :295-316) is computed once from the two
    refit segments via `lax.switch`;
  - the per-pose corrections for the whole map are one vectorized transform
    (the reference loops over corrected_poses_);
  - the tail carry (ApplyExplicitCorrections :387-415) — rigidly transporting
    every pose after the corrected group — is a masked batched affine.
    Deviation (documented): the reference rotates tail poses about the last
    group pose at its *already-updated* position and then re-adds its
    translation delta (:399-414), leaving a small seam offset between group
    and tail. We apply the one true rigid map p -> target + R(p - center) to
    group AND tail, which keeps the tail exactly attached; the joint solve
    re-optimizes either way;
  - constraint targets (calculateConstraintTargets :447-487) are the
    (delta_parallel, delta_perpendicular, delta_angle, penalty_dir) offsets of
    every (anchor, corrected) pair in the anchor frame, computed from the
    POST-explicit poses, batched over the padded pair grid.

Like the reference (which only applies contiguous group 0 and carries the
rest, :358-415 'TODO handle multiple contiguous groups properly'), the carry
uses the first contiguous run of corrected poses; the host passes its mask
and last index in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.geometry import angle_mod, rotate, scalar_cross

Array = jax.Array


def _seg_dirs(sel: Array) -> tuple[Array, Array, Array, Array]:
    cmA = 0.5 * (sel[0] + sel[1])
    cmB = 0.5 * (sel[2] + sel[3])
    A = sel[1] - sel[0]
    A = A / jnp.maximum(jnp.linalg.norm(A), 1e-12)
    B = sel[3] - sel[2]
    B = B / jnp.maximum(jnp.linalg.norm(B), 1e-12)
    return cmA, cmB, A, B


def _signed_angle(A: Array, B: Array) -> Array:
    dot = jnp.clip(jnp.dot(A, B), -1.0, 1.0)
    theta = jnp.arccos(dot)
    return jnp.where(scalar_cross(A, B) < 0.0, -theta, theta)


def correction_transform(ctype: Array, sel: Array) -> tuple[Array, Array, Array]:
    """-> (theta, center, target_center): corrected poses move as
    p' = target_center + R(theta) (p - center).

    point:        translate the clicked point onto the anchor point
                  (no rotation) — sel rows are [p, p, q, q].
    line-to-line: rotate A onto B about cmA, then translate cmA -> cmB.
    corner:       rotate A onto B about the drag-START vertex (the corner),
                  then translate vertex -> vertex — sel rows are
                  [corner_c, along-wall_c, corner_a, along-wall_a].
    colinear:     same rotation; cmA translates to its projection on line B.
    perpendicular: rotate so A is perpendicular to B, about cmA (no transl).
    parallel:      rotate A parallel to B, about cmA (no translation).

    POINT and CORNER are declared-but-unsupported in the reference
    (human_constraints.h:8-16, README key map); the semantics here are the
    natural completion of the family: corner = colocation anchored at the
    feature vertex instead of the segment midpoint; point = pure
    translation (a point pair constrains no rotation).
    """
    cmA, cmB, A, B = _seg_dirs(sel)
    theta_ab = _signed_angle(A, B)

    def point(_):
        return jnp.zeros_like(theta_ab), sel[0], sel[2]

    def line_to_line(_):
        return theta_ab, cmA, cmB

    def corner(_):
        return theta_ab, sel[0], sel[2]

    def colinear(_):
        alpha = jnp.dot(cmA - cmB, B)
        return theta_ab, cmA, cmB + alpha * B

    def perpendicular(_):
        # reference branch structure (ApplyExplicitCorrection.cpp:276-283):
        # already-perpendicular -> 0; otherwise rotate by theta -/+ pi/2
        t = theta_ab
        t = jnp.where(
            jnp.abs(jnp.abs(t) - jnp.pi / 2) < 1e-7,
            0.0,
            jnp.where(t > 0.0, t - jnp.pi / 2, t + jnp.pi / 2),
        )
        return t, cmA, cmA

    def parallel(_):
        return theta_ab, cmA, cmA

    branch = jnp.clip(ctype.astype(jnp.int32) - 1, 0, 5)
    # ctype {1: point, 2: l2l, 3: corner, 4: colinear, 5: perp, 6: parallel}
    return lax.switch(
        branch,
        [point, line_to_line, corner, colinear, perpendicular, parallel],
        None,
    )


def apply_explicit(
    poses: Array,
    ctype: Array,
    sel: Array,
    group_mask: Array,
    last_pose: Array,
) -> tuple[Array, Array]:
    """Apply the rigid correction to the first contiguous corrected group and
    carry the tail, all as masked batched ops.

    poses [P,3]; group_mask [P] bool (contiguous run of corrected poses);
    last_pose scalar int (last index of the run).
    Returns (new_poses [P,3], correction C [3] = group-first pose's delta,
    the value Backprop consumes — AppExpCorrections returns
    contiguous_corrections[0][0].second, :441).
    """
    theta, center, target = correction_transform(ctype, sel)
    p = poses[:, :2]
    moved = target + rotate(theta, p - center)
    T = moved - p                              # per-pose translation delta

    idx = jnp.arange(poses.shape[0])
    affected = group_mask | (idx > last_pose)  # group + rigid tail carry
    new_xy = jnp.where(affected[:, None], p + T, p)
    new_th = jnp.where(affected, poses[:, 2] + theta, poses[:, 2])

    first_idx = jnp.argmax(group_mask)
    C = jnp.concatenate([T[first_idx], theta[None]])
    return jnp.concatenate([new_xy, new_th[:, None]], axis=1), C


def constraint_deltas(
    poses: Array,
    sel: Array,
    anchor_idx: Array,
    corr_idx: Array,
) -> tuple[Array, Array, Array, Array, Array]:
    """Per-(anchor, corrected) pair relative offsets in the anchor frame,
    from the post-explicit poses (calculateConstraintTargets semantics).

    anchor_idx [MA], corr_idx [MC] int32 (pad with -1).
    Returns (delta_parallel, delta_perpendicular, delta_angle, penalty_dir,
    valid) each [MA, MC] (penalty_dir is per-anchor, broadcast).
    """
    corr_dir = sel[3] - sel[2]
    corr_angle = jnp.arctan2(corr_dir[1], corr_dir[0])

    a_valid = anchor_idx >= 0
    c_valid = corr_idx >= 0
    a = poses[jnp.maximum(anchor_idx, 0)]      # [MA,3]
    c = poses[jnp.maximum(corr_idx, 0)]        # [MC,3]

    ath = a[:, 2]
    pen = angle_mod(corr_angle - ath) + jnp.pi / 2.0      # [MA]
    para = jnp.stack([jnp.cos(ath), jnp.sin(ath)], -1)     # [MA,2]
    perp = jnp.stack([-para[:, 1], para[:, 0]], -1)

    rel = c[None, :, :2] - a[:, None, :2]                  # [MA,MC,2]
    dpar = jnp.einsum("ak,ack->ac", para, rel)
    dperp = jnp.einsum("ak,ack->ac", perp, rel)
    dth = angle_mod(c[None, :, 2] - ath[:, None])
    valid = a_valid[:, None] & c_valid[None, :]
    pen2 = jnp.broadcast_to(pen[:, None], dpar.shape)
    return dpar, dperp, dth, pen2, valid
