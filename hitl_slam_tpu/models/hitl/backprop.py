"""COP-SLAM-style covariance-weighted error backpropagation, O(P) on device.

TPU redesign of Backprop (Backprop.cpp:98-210). The reference distributes the
explicit correction (dx, dy, dtheta) over the open backprop window with
per-pose weights sigma_i / sum(sigma), then applies O(W^2) nested loops:
each window pose i rotates every later pose (up to the window end) about its
own current position. That composition closes under prefix sums: with A_i
the composition of the first i rotation steps, A_i.R = R(cumsum(dtheta)_i)
and A_i.b accumulates the elementwise increments
(I - R(dtheta_i)) R(Theta_{i-1}) p_i — two cumsums, no scan at all
(sequential lax loops do not pipeline inside fused TPU programs). The
translation stage is a third cumsum. Fully shape-static with the window
expressed as masks so the jit never recompiles for different bounds.

Weight/variance semantics preserved exactly (Backprop.cpp:106-137):
  rot_sigma_i   = cov[i][2,2]
  trans_sigma_i = (cov[i][0,0] + cov[i][1,1]) / 2
  weights       = sigma_i / (sum over window + destination variance)
  destination variances: rot 1e-4, trans 1e-3
  beta blend uses sigma[max_poses - 1] (same off-by-one as the reference)

Deviation (documented): the reference's covariance update scales entry (0,2)
by rot_beta TWICE and never scales (1,2) (Backprop.cpp:160-170 — an evident
typo). We scale the symmetric pairs (0,2),(2,0),(1,2),(2,1) once each. Only
diagonal entries feed later backprop weights, so behavior downstream is
unchanged; saved covariances differ only in those off-diagonal entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

DEST_ROT_VARIANCE = 1e-4    # rad^2  (Backprop.cpp:106)
DEST_TRANS_VARIANCE = 1e-3  # m^2    (Backprop.cpp:107)


@jax.jit
def backprop(
    poses: Array,
    covariances: Array,
    correction: Array,   # [3] (dx, dy, dtheta) from the explicit stage
    bp_min: Array,       # scalar int32, first window pose
    bp_max: Array,       # scalar int32, last window pose (the anchor-side end)
) -> tuple[Array, Array]:
    """Returns (new_poses, new_covariances). No-op when bp_min >= bp_max
    (Backprop.cpp Run() guard)."""
    P = poses.shape[0]
    idx = jnp.arange(P)
    in_window = (idx >= bp_min) & (idx <= bp_max)       # [min, max]
    weight_mask = (idx >= bp_min) & (idx < bp_max)      # i in [min, max)

    rot_sigma = covariances[:, 2, 2]
    trans_sigma = 0.5 * (covariances[:, 0, 0] + covariances[:, 1, 1])

    sum_rot = jnp.sum(jnp.where(in_window, rot_sigma, 0.0)) + DEST_ROT_VARIANCE
    sum_trans = (
        jnp.sum(jnp.where(in_window, trans_sigma, 0.0)) + DEST_TRANS_VARIANCE
    )
    w_rot = jnp.where(weight_mask, rot_sigma / sum_rot, 0.0)
    w_trans = jnp.where(weight_mask, trans_sigma / sum_trans, 0.0)

    # ---- covariance scaling (applied to poses [min, max)) ----
    prev_rot_sigma = rot_sigma[jnp.maximum(bp_max - 1, 0)]
    prev_trans_sigma = trans_sigma[jnp.maximum(bp_max - 1, 0)]
    rot_beta = 1.0 / (1.0 + prev_rot_sigma / DEST_ROT_VARIANCE)
    trans_beta = 1.0 / (1.0 + prev_trans_sigma / DEST_TRANS_VARIANCE)
    scale = jnp.ones((3, 3), poses.dtype)
    scale = scale.at[0:2, 0:2].set(trans_beta)
    scale = scale.at[0:2, 2].set(rot_beta)
    scale = scale.at[2, 0:2].set(rot_beta)
    scale = scale.at[2, 2].set(rot_beta)
    new_cov = jnp.where(
        weight_mask[:, None, None], covariances * scale[None], covariances
    )

    # ---- rotation stage: compose rotations about successive pose positions.
    # The reference's O(W^2) nested loops (and a naive scan) are avoidable:
    # with A_i the composition of steps <= i, A_i.R = R(cumsum(dtheta)) and
    # A_i.b - A_{i-1}.b = (I - R(dtheta_i)) R(Theta_{i-1}) p_i, so BOTH
    # components are prefix sums of elementwise increments — two cumsums, no
    # scan (sequential scans do not pipeline inside fused programs on TPU).
    dtheta = w_rot * correction[2]                      # [P], zero outside
    xy = poses[:, :2]

    theta_inc = jnp.cumsum(dtheta)                      # Theta_i
    theta_pre = theta_inc - dtheta                      # Theta_{i-1}
    rot_pre_p = _rot(theta_pre, xy)                     # R(Theta_{i-1}) p_i
    # (I - R(d_i)) v = v - R(d_i) v
    b_inc = rot_pre_p - _rot(dtheta, rot_pre_p)
    bs = jnp.cumsum(b_inc, axis=0) - b_inc              # A_{k-1}.b
    phis = theta_pre                                    # A_{k-1}.R angle
    new_xy = jnp.where(in_window[:, None], _rot(phis, xy) + bs, xy)
    own = jnp.where(weight_mask, dtheta, 0.0)           # pose i also gets its
    ang_inc = theta_pre + own                           # own increment
    new_th = jnp.where(in_window, poses[:, 2] + ang_inc, poses[:, 2])

    # ---- translation stage ----
    destination = xy[bp_max] + correction[:2]
    trans = destination - new_xy[bp_max]
    dtrans = w_trans[:, None] * trans[None]             # [P,2]
    t_prefix = jnp.cumsum(dtrans, axis=0) - dtrans      # sum_{i<k}
    new_xy = jnp.where(in_window[:, None], new_xy + t_prefix, new_xy)

    new_poses = jnp.concatenate([new_xy, new_th[:, None]], axis=1)
    valid = bp_min < bp_max
    return (
        jnp.where(valid, new_poses, poses),
        jnp.where(valid, new_cov, covariances),
    )


def _rot(phi: Array, v: Array) -> Array:
    c, s = jnp.cos(phi), jnp.sin(phi)
    return _rot2(c, s, v)


def _rot2(c: Array, s: Array, v: Array) -> Array:
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)
