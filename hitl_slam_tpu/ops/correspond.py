"""Correspondence engine: grid-bucketed nearest-neighbor point matching.

TPU redesign of the reference's STF (short-term-feature) machinery — the
per-pose KD-trees (perception_tools/kdtree.h, JointOptimization.cpp
BuildKDTrees :514-537) and the OMP all-pairs FindSTFCorrespondences
(:561-642): every point of every pose queries every other pose's tree for a
nearest neighbor within `point_match_threshold` whose normal agrees within
`max_stf_angle_error`.

Instead of P trees and P^2*N pointer-chasing queries, all points go into ONE
world-frame uniform grid with cell size = match threshold; each point scans
the 3x3 neighborhood of its cell (sort by cell id + binary search + fixed
candidate window — pure gathers, no data-dependent shapes), with same-pose
matches excluded and the normal gate applied in the same pass. O(M * 9W)
fully-vectorized work for M points total.

Deviations (documented):
  - the reference caps matches per source point at
    `max_correspondences_per_point` (6) in pose-scan order (:594-600), an
    order-dependent rule; here each source point contributes its single best
    match (the KD-tree NN was already 1 per (point, target-pose); the global
    grid finds the best across targets). Bundles below the reference's
    10-match-per-pair floor are dropped the same way.
  - matching runs in the world frame once rather than per-pair relative
    frames; identical geometry, one transform.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# reference config values (config/non_markov_localization.cfg:47-50)
POINT_MATCH_THRESHOLD = 0.15
MAX_STF_ANGLE_ERROR = 25.0 * jnp.pi / 180.0
LASER_STD_DEV = 0.05
POINT_CORRELATION_FACTOR = 1.0 / 40.0
MIN_PAIR_MATCHES = 10        # kMinInterPoseCorrespondence (JointOptimization.cpp:563)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Matches:
    """Per-source-point best cross-pose match (flat indexing over P*N)."""

    target: Array   # [M] int32 flat index of matched point (0 if invalid)
    valid: Array    # [M] bool
    dist: Array     # [M] f32 distance to match


@partial(jax.jit, static_argnames=("window", "grid_hw"))
def grid_match(
    world_pts: Array,     # [P, N, 2]
    world_nrm: Array,     # [P, N, 2]
    mask: Array,          # [P, N]
    threshold: float = POINT_MATCH_THRESHOLD,
    min_cos: float = float(jnp.cos(MAX_STF_ANGLE_ERROR)),
    window: int = 16,     # candidates scanned per neighboring cell
    grid_hw: int = 1024,  # cells per axis (hash-folded)
) -> Matches:
    """Approximate-NN with measured recall (tests/test_scan_match.py
    test_grid_match_recall): on a dense Figure8 cloud (max cell occupancy
    ~45 points at the 0.15 m cell size) the query-centered sub-cell window
    misses <0.5% of brute-force matches, and suboptimal picks average ~1 cm
    of excess distance — negligible under the point-to-plane metric. Dense
    cells beyond `window` candidates are handled by sorting points by a 4x4
    sub-cell key and CENTERING each query's fixed scan window at its own
    sub-cell position within the cell run, so the scanned candidates are the
    spatially nearest in sub-cell order rather than the first arrivals."""
    P, N, _ = world_pts.shape
    M = P * N
    pts = world_pts.reshape(M, 2)
    nrm = world_nrm.reshape(M, 2)
    fmask = mask.reshape(M)
    pose_id = jnp.repeat(jnp.arange(P, dtype=jnp.int32), N)

    SUB = 4  # sub-cells per axis inside each cell (fine ordering key)
    inv_h = 1.0 / threshold
    fx = jnp.floor(pts[:, 0] * inv_h * SUB).astype(jnp.int32)
    fy = jnp.floor(pts[:, 1] * inv_h * SUB).astype(jnp.int32)
    cx = jnp.floor_divide(fx, SUB)
    cy = jnp.floor_divide(fy, SUB)
    # fold into a bounded hash grid; collisions only add candidates (they are
    # rejected by the true distance test)
    cell = (jnp.mod(cx, grid_hw) * grid_hw + jnp.mod(cy, grid_hw))
    sub = (fx - cx * SUB) * SUB + (fy - cy * SUB)            # 0..15
    key = cell * (SUB * SUB) + sub
    key = jnp.where(fmask, key, jnp.iinfo(jnp.int32).max)    # masked -> end

    order = jnp.argsort(key)
    sorted_key = key[order]

    best_d2 = jnp.full((M,), jnp.inf, pts.dtype)
    best_idx = jnp.zeros((M,), jnp.int32)
    t2 = threshold * threshold

    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ncx, ncy = cx + dx, cy + dy
            ncell = (jnp.mod(ncx, grid_hw) * grid_hw
                     + jnp.mod(ncy, grid_hw))
            base = ncell * (SUB * SUB)
            start = jnp.searchsorted(sorted_key, base, side="left")
            end = jnp.searchsorted(sorted_key, base + SUB * SUB, side="left")
            # center the scan window at the query's sub-cell position within
            # this neighbor cell's run
            qsub = (jnp.clip(fx - ncx * SUB, 0, SUB - 1) * SUB
                    + jnp.clip(fy - ncy * SUB, 0, SUB - 1))
            center = jnp.searchsorted(sorted_key, base + qsub, side="left")
            lo = jnp.clip(center - window // 2, start,
                          jnp.maximum(end - window, start))
            for w in range(window):
                slot = lo + w
                ok = slot < end
                cand = order[jnp.minimum(slot, M - 1)]
                d2 = jnp.sum((pts - pts[cand]) ** 2, axis=-1)
                cos = jnp.sum(nrm * nrm[cand], axis=-1)
                good = (
                    ok
                    & fmask
                    & fmask[cand]
                    & (pose_id[cand] != pose_id)
                    & (d2 < t2)
                    & (cos > min_cos)
                    & (d2 < best_d2)
                )
                best_d2 = jnp.where(good, d2, best_d2)
                best_idx = jnp.where(good, cand, best_idx)

    valid = jnp.isfinite(best_d2)
    return Matches(target=best_idx, valid=valid, dist=jnp.sqrt(
        jnp.where(valid, best_d2, 0.0)))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class STFFactors:
    """Compacted symmetric point-to-plane factors with static capacity C.

    Residuals (PointToPointGlobConstraint semantics, residual_functors.h
    :768-848, per-match form): with p0/p1 and n0/n1 the matched points and
    normals in their poses' robot frames,
        r0 = w * n0_world . (p1_world - p0_world)
        r1 = w * n1_world . (p1_world - p0_world)
    where w folds std_dev, correlation factor, and the reference's per-bundle
    RMS normalization (1/sqrt(n_matches(pair))).
    """

    pose0: Array   # [C] int32
    pose1: Array   # [C] int32
    p0: Array      # [C, 2] robot frame of pose0
    p1: Array      # [C, 2] robot frame of pose1
    n0: Array      # [C, 2]
    n1: Array      # [C, 2]
    weight: Array  # [C]
    valid: Array   # [C] bool


@partial(jax.jit, static_argnames=("capacity",))
def build_stf_factors(
    points: Array,    # [P, N, 2] robot frame
    normals: Array,   # [P, N, 2] robot frame
    matches: Matches,
    capacity: int = 65536,
    std_dev: float = LASER_STD_DEV,
    correlation_factor: float = POINT_CORRELATION_FACTOR,
    min_pair_matches: int = MIN_PAIR_MATCHES,
) -> STFFactors:
    P, N, _ = points.shape
    M = P * N
    flat_pts = points.reshape(M, 2)
    flat_nrm = normals.reshape(M, 2)
    src = jnp.arange(M, dtype=jnp.int32)
    tgt = matches.target
    pose0 = src // N
    pose1 = tgt // N

    # each matched source point contributes ONE symmetric factor (both
    # normals in the residual); the reference instead adds both directions
    # as separate one-sided bundles — same information, half the rows
    valid = matches.valid

    # per-(pose0,pose1) bundle sizes for the RMS normalization + min-10 gate
    pair_key = jnp.where(valid, pose0 * P + pose1, jnp.iinfo(jnp.int32).max)
    sort_idx = jnp.argsort(pair_key)
    sorted_key = pair_key[sort_idx]
    left = jnp.searchsorted(sorted_key, pair_key, side="left")
    right = jnp.searchsorted(sorted_key, pair_key, side="right")
    pair_count = (right - left).astype(points.dtype)
    valid = valid & (pair_count >= min_pair_matches)

    w = (correlation_factor / std_dev) / jnp.sqrt(jnp.maximum(pair_count, 1.0))

    # compact the valid matches into the fixed-capacity table
    slots = jnp.cumsum(valid) - 1
    slots = jnp.where(valid, jnp.clip(slots, 0, capacity - 1), capacity - 1)
    take = lambda a: jnp.zeros((capacity,) + a.shape[1:], a.dtype).at[
        slots].set(jnp.where(
            valid.reshape((-1,) + (1,) * (a.ndim - 1)), a, 0))
    f = STFFactors(
        pose0=take(pose0), pose1=take(pose1),
        p0=take(flat_pts[src]), p1=take(flat_pts[tgt]),
        n0=take(flat_nrm[src]), n1=take(flat_nrm[tgt]),
        weight=take(w),
        valid=jnp.zeros((capacity,), bool).at[slots].set(valid),
    )
    # slot capacity-1 may hold garbage from invalid writes
    return STFFactors(
        pose0=f.pose0, pose1=f.pose1, p0=f.p0, p1=f.p1, n0=f.n0, n1=f.n1,
        weight=f.weight,
        valid=f.valid.at[capacity - 1].set(
            f.valid[capacity - 1] & (jnp.sum(valid) >= capacity)),
    )


def stf_residuals(f: STFFactors, poses: Array) -> Array:
    """[C, 2] symmetric point-to-plane residuals at `poses`."""
    from .geometry import rotate

    q0 = poses[f.pose0]
    q1 = poses[f.pose1]
    p0w = rotate(q0[:, 2], f.p0) + q0[:, :2]
    p1w = rotate(q1[:, 2], f.p1) + q1[:, :2]
    n0w = rotate(q0[:, 2], f.n0)
    n1w = rotate(q1[:, 2], f.n1)
    dp = p1w - p0w
    r0 = jnp.sum(n0w * dp, axis=-1) * f.weight
    r1 = jnp.sum(n1w * dp, axis=-1) * f.weight
    r = jnp.stack([r0, r1], axis=-1)
    return jnp.where(f.valid[:, None], r, 0.0)


def stf_jacobians(f: STFFactors, poses: Array) -> tuple[Array, Array]:
    """Analytic Jacobians wrt (pose0, pose1): each [C, 2, 3].

    d r0 / d pose0: translation: -w n0w; rotation: w (n0w' . dp - n0w . p0w')
    where v' denotes rotation of v by +90deg scaled derivative d(R(th)v)/dth
    = R(th + pi/2) v = perp(R v).
    """
    from .geometry import perp, rotate

    q0 = poses[f.pose0]
    q1 = poses[f.pose1]
    p0w = rotate(q0[:, 2], f.p0) + q0[:, :2]
    p1w = rotate(q1[:, 2], f.p1) + q1[:, :2]
    n0w = rotate(q0[:, 2], f.n0)
    n1w = rotate(q1[:, 2], f.n1)
    dp = p1w - p0w
    w = f.weight

    dp0_dth = perp(p0w - q0[:, :2])     # d p0w / d th0
    dp1_dth = perp(p1w - q1[:, :2])
    dn0_dth = perp(n0w)
    dn1_dth = perp(n1w)

    # r0 = w n0w . dp
    r0_t0 = -w[:, None] * n0w
    r0_th0 = w * (jnp.sum(dn0_dth * dp, -1) - jnp.sum(n0w * dp0_dth, -1))
    r0_t1 = w[:, None] * n0w
    r0_th1 = w * jnp.sum(n0w * dp1_dth, -1)
    # r1 = w n1w . dp
    r1_t0 = -w[:, None] * n1w
    r1_th0 = -w * jnp.sum(n1w * dp0_dth, -1)
    r1_t1 = w[:, None] * n1w
    r1_th1 = w * (jnp.sum(dn1_dth * dp, -1) + jnp.sum(n1w * dp1_dth, -1))

    J0 = jnp.stack([
        jnp.concatenate([r0_t0, r0_th0[:, None]], -1),
        jnp.concatenate([r1_t0, r1_th0[:, None]], -1),
    ], axis=1)
    J1 = jnp.stack([
        jnp.concatenate([r0_t1, r0_th1[:, None]], -1),
        jnp.concatenate([r1_t1, r1_th1[:, None]], -1),
    ], axis=1)
    v = f.valid[:, None, None]
    return jnp.where(v, J0, 0.0), jnp.where(v, J1, 0.0)
