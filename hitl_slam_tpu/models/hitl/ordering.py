"""Device-side selection ordering/filtering — OrderAndFilterUserInput as
branch-free masked array ops.

Same decision procedure as em_input.order_and_filter (the host reference
implementation, kept for differential testing) and the reference C++
(EMinput.cpp:325-455), but expressed with masks/argmax/sort so the whole
correction cycle fuses into ONE XLA program with zero host round trips:

  - participation masks from inlier counts (> 5 gate)
  - overlap resolution (4 cases)
  - role assignment + selected-point pair swap when the user drew the
    anchor pair first
  - open-interval backprop bounds
  - first contiguous corrected group + its last pose (the host engine used
    to derive these with numpy; see ApplyExplicitCorrection.cpp:358-385)
  - fixed-capacity (MAX_ANCHORS/MAX_CORRECTED) index lists, pad -1.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Array = jax.Array

MIN_POSE_INLIERS = 5
MAX_ANCHORS = 64
MAX_CORRECTED = 64


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceOrdering:
    valid: Array          # scalar bool
    sel: Array            # [4,2] possibly swapped
    corrected_mask: Array  # [P]
    anchor_mask: Array     # [P]
    corrected_idx: Array   # [MAX_CORRECTED] pad -1
    anchor_idx: Array      # [MAX_ANCHORS] pad -1
    group_mask: Array      # [P] first contiguous corrected run
    last_pose: Array       # scalar int32
    bp_min: Array          # scalar int32
    bp_max: Array          # scalar int32


def _mask_min(mask: Array, idx: Array, P: int) -> Array:
    return jnp.min(jnp.where(mask, idx, P))


def _mask_max(mask: Array, idx: Array) -> Array:
    return jnp.max(jnp.where(mask, idx, -1))


def _top_indices(mask: Array, idx: Array, k: int, P: int) -> Array:
    """First k set indices ascending, padded with -1."""
    vals = jnp.where(mask, idx, P)
    picked = jnp.sort(vals)[:k]
    return jnp.where(picked < P, picked, -1).astype(jnp.int32)


def order_on_device(c1: Array, c2: Array, sel: Array,
                    min_inliers: Array | int = MIN_POSE_INLIERS
                    ) -> DeviceOrdering:
    """min_inliers may be a traced scalar: POINT corrections use a 1-inlier
    gate (a single observed point cannot produce >5 pill inliers)."""
    P = c1.shape[0]
    idx = jnp.arange(P)
    first = c1 > min_inliers
    second = c2 > min_inliers
    overlap = first & second
    n_f = jnp.sum(first)
    n_s = jnp.sum(second)
    n_o = jnp.sum(overlap)

    complete = (n_o == n_f) & (n_o == n_s) & (n_o > 0)
    # overlap-resolution cases (EMinput.cpp:377-404)
    drop_from_second = (n_o == n_f) & ~complete
    drop_from_first = (n_o == n_s) & ~complete & ~drop_from_second
    drop_both = (n_o > 0) & ~complete & ~drop_from_second & ~drop_from_first

    first2 = jnp.where(drop_from_first | drop_both, first & ~overlap, first)
    second2 = jnp.where(drop_from_second | drop_both, second & ~overlap, second)
    n_f2 = jnp.sum(first2)
    n_s2 = jnp.sum(second2)

    f_min = _mask_min(first2, idx, P)
    f_max = _mask_max(first2, idx)
    s_min = _mask_min(second2, idx, P)
    s_max = _mask_max(second2, idx)

    first_is_corrected = f_min > s_max
    swapped = (f_max < s_min) & ~first_is_corrected
    ordered_ok = first_is_corrected | swapped

    corrected = jnp.where(first_is_corrected, first2, second2)
    anchors = jnp.where(first_is_corrected, second2, first2)
    bp_min = jnp.where(first_is_corrected, s_max + 1, f_max + 1)
    bp_max = jnp.where(first_is_corrected, f_min - 1, s_min - 1)

    sel_out = jnp.where(swapped, sel[jnp.array([2, 3, 0, 1])], sel)

    valid = (
        ~complete
        & (n_f2 > 0)
        & (n_s2 > 0)
        & ordered_ok
        & (bp_min >= 0)
        & (bp_max >= 1)
    )

    # first contiguous corrected run + last pose
    start = jnp.argmax(corrected)
    broken = (~corrected) & (idx >= start)
    group = corrected & (jnp.cumsum(broken) == 0)
    last_pose = _mask_max(group, idx).astype(jnp.int32)

    return DeviceOrdering(
        valid=valid,
        sel=sel_out,
        corrected_mask=corrected,
        anchor_mask=anchors,
        corrected_idx=_top_indices(corrected, idx, MAX_CORRECTED, P),
        anchor_idx=_top_indices(anchors, idx, MAX_ANCHORS, P),
        group_mask=group,
        last_pose=last_pose,
        bp_min=bp_min.astype(jnp.int32),
        bp_max=bp_max.astype(jnp.int32),
    )
