"""Pure-jnp 2D geometry ops shared by every pipeline stage.

Replaces the reference's shared math layer (gvector/eigen_helper/util) and
perception_2d with vmappable array programs:
  - angle_mod            (reference: shared/math/util.h:431-434)
  - pose compose/apply   (reference: perception_2d.h:31-94)
  - point-to-segment     (reference: shared/math/eigen_helper.h DistanceToLineSegment,
                          EMinput.cpp:199-218 distToLineSeg)
  - normals generation   (reference: perception_2d.cpp:34-65 GenerateNormals)

Everything here is shape-polymorphic, jit/vmap-safe, and dtype-preserving.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def angle_mod(a: Array) -> Array:
    """Wrap angle(s) to (-pi, pi] via atan2 — branch-free, autodiff-clean.

    Matches the reference's `angle_mod` / `atan2(sin, cos)` idiom
    (HitLSLAM.cpp:443-447, residual_functors.h:1099-1121).
    """
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def rot2(theta: Array) -> Array:
    """2x2 rotation matrix(es) for angle(s); output shape theta.shape + (2, 2)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate(theta: Array, v: Array) -> Array:
    """Rotate 2-vector(s) v by angle(s) theta. Broadcasts over leading dims."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def perp(v: Array) -> Array:
    """90-degree CCW rotation of 2-vector(s): (x, y) -> (-y, x)."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def scalar_cross(a: Array, b: Array) -> Array:
    """z-component of the 3D cross product of two 2-vectors
    (reference: eigen_helper.h ScalarCross)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def pose_to_world(pose: Array, pts: Array) -> Array:
    """Transform robot-frame point(s) into the world frame.

    pose: [..., 3] = (x, y, theta);  pts: [..., 2] broadcastable.
    world = R(theta) @ p + t   (reference: HitLSLAM.cpp
    transformPointCloudsToWorldFrame).
    """
    return rotate(pose[..., 2:3].squeeze(-1), pts) + pose[..., :2]


def world_to_robot(pose: Array, pts: Array) -> Array:
    """Inverse of pose_to_world: p = R(-theta) @ (world - t)
    (reference: HitLSLAM_main.cpp:242-297 world->robot inverse transform)."""
    return rotate(-pose[..., 2:3].squeeze(-1), pts - pose[..., :2])


def dist_to_segment(p1: Array, p2: Array, p: Array) -> Array:
    """Euclidean distance from point(s) p to segment [p1, p2].

    Broadcasts: p1, p2 [..., 2]; p [..., 2]. Clamps the projection parameter to
    [0, 1] — identical semantics to the reference's distToLineSeg
    (EMinput.cpp:281-300) but branch-free.
    """
    d = p2 - p1
    denom = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-20)
    t = jnp.sum((p - p1) * d, axis=-1) / denom
    t = jnp.clip(t, 0.0, 1.0)
    proj = p1 + t[..., None] * d
    return jnp.linalg.norm(p - proj, axis=-1)


def generate_normals(
    points: Array, mask: Array, max_neighbor_dist: float = 0.5
) -> tuple[Array, Array]:
    """Normals for an ordered 2D scan: normal_i = mean of 90deg-rotated unit
    tangents to valid neighbors (reference: perception_2d.cpp:34-65).

    The reference *erases* points with no valid neighbor; with static shapes we
    instead clear their mask bit. points: [N, 2], mask: [N] bool.
    Returns (normals [N, 2], new_mask [N]).
    """
    prev_d = points - jnp.roll(points, 1, axis=0)
    next_d = jnp.roll(points, -1, axis=0) - points
    n = points.shape[0]
    idx = jnp.arange(n)
    prev_ok = (
        (idx > 0)
        & mask
        & jnp.roll(mask, 1)
        & (jnp.linalg.norm(prev_d, axis=-1) < max_neighbor_dist)
    )
    next_ok = (
        (idx < n - 1)
        & mask
        & jnp.roll(mask, -1)
        & (jnp.linalg.norm(next_d, axis=-1) < max_neighbor_dist)
    )

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    contrib = jnp.where(prev_ok[:, None], perp(unit(prev_d)), 0.0) + jnp.where(
        next_ok[:, None], perp(unit(next_d)), 0.0
    )
    count = prev_ok.astype(points.dtype) + next_ok.astype(points.dtype)
    normal = unit(contrib / jnp.maximum(count, 1.0)[:, None])
    new_mask = mask & (count > 0)
    return jnp.where(new_mask[:, None], normal, 0.0), new_mask
