"""Correspondence engine: grid-bucketed nearest-neighbor point matching.

TPU redesign of the reference's STF (short-term-feature) machinery — the
per-pose KD-trees (perception_tools/kdtree.h, JointOptimization.cpp
BuildKDTrees :514-537) and the OMP all-pairs FindSTFCorrespondences
(:561-642): every point of every pose queries every other pose's tree for a
nearest neighbor within `point_match_threshold` whose normal agrees within
`max_stf_angle_error`.

Instead of P trees and P^2*N pointer-chasing queries, all points are binned
ONCE into a compact table of occupied grid cells (cell size = match
threshold) with a fixed per-cell `bucket` capacity: one stable sort by cell
key, one fused row gather, one collision-free scatter. The 3x3 neighborhood
search is then DENSE batched compute over [max_cells, bucket, bucket] tiles
— every query slot scans every candidate slot of each neighboring cell with
plain vectorized arithmetic, exact within the 3x3 neighborhood.

Why not gather-per-candidate (the usual GPU formulation, and this module's
first design): on this TPU a single random row gather over a 262k-point
cloud measures ~2.8 ms and a searchsorted ~35 ms (18 binary-search rounds of
gathers), so a windowed candidate scan (9 cells x 16 candidates x ~5 gathers
+ 27 searchsorteds) costs ~4.1 s. The bucket redesign does O(1) gathers
total plus dense VPU tiles: ~60x faster at identical output (and exact —
the windowed scan was approximate in dense cells).

Deviations (documented):
  - the reference caps matches per source point at
    `max_correspondences_per_point` (6) in pose-scan order (:594-600), an
    order-dependent rule; here each source point contributes its single best
    match (the KD-tree NN was already 1 per (point, target-pose); the global
    grid finds the best across targets). Bundles below the reference's
    10-match-per-pair floor are dropped the same way.
  - matching runs in the world frame once rather than per-pair relative
    frames; identical geometry, one transform.
  - capacity clamps: points beyond `bucket` per cell or `max_cells` occupied
    cells are dropped from matching (counted in Matches.dropped; zero on all
    shipped configs — Figure8 max occupancy is ~45 at the 0.15 m cell).
    Points beyond the grid span (~2.4 km from origin at the 0.15 m cell) are
    likewise masked out and counted in Matches.dropped rather than aliased
    into border cells.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

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
    dropped: Array  # scalar int32: in-mask points not binned (capacity clamp)


@partial(jax.jit, static_argnames=("bucket", "max_cells"))
def grid_match(
    world_pts: Array,     # [P, N, 2]
    world_nrm: Array,     # [P, N, 2]
    mask: Array,          # [P, N]
    threshold: float = POINT_MATCH_THRESHOLD,
    min_cos: float = float(np.cos(MAX_STF_ANGLE_ERROR)),
    bucket: int = 64,     # per-cell point capacity (a density cap, see below)
    max_cells: int | None = None,  # occupied-cell capacity (None: M // 32)
) -> Matches:
    """Exact best-in-3x3-neighborhood NN via dense bucket tables.

    Stage 1 (bin): stable-sort flat points by integer cell key; cell c's
    bucket is then the contiguous sorted rows cell_start[c]..+bucket-1, so
    the SoA bucket table (positions, normals, pose id, flat idx per
    [max_cells, bucket] slot) is built by one composed block-row GATHER
    (idx2 = order[slot]) — no scatter at all, and pose id / flat idx /
    occupancy are arithmetic on idx2.

    Stage 2 (match): each neighbor cell's compact id comes from ONE
    searchsorted over the [max_cells] sorted cell keys; the center + 4
    representative offsets' buckets are concatenated into one
    [max_cells, bucket, 5*bucket] gated-distance tile (distance + normal
    gate + same-pose exclusion; f32 lane padding makes one wide tile ~1.7x
    cheaper in padded lanes than 5 narrow ones). Each +offset slice also
    serves the opposite offset by reducing over the QUERY axis and
    scattering to the neighbor's rows (collision-free nb mapping), so the
    3x3 neighborhood costs one forward + 4 sliced reverse reductions.
    Exact whenever nothing is dropped (Matches.dropped == 0; capacity
    clamps documented in the module docstring)."""
    P, N, _ = world_pts.shape
    M = P * N
    if max_cells is None:
        # 2D lidar maps occupy ~perimeter*laps/h cells; M//32 holds 1.5-3x
        # headroom on the shipped configs (Figure8 2-lap: 5293 occupied at
        # M=262144). Violations surface in Matches.dropped.
        max_cells = max(1024, min(16384, M // 32))
    dtype = world_pts.dtype
    pts = world_pts.reshape(M, 2)
    nrm = world_nrm.reshape(M, 2)
    fmask = mask.reshape(M)
    INT_MAX = jnp.iinfo(jnp.int32).max

    # integer cell key: offset keeps coords positive; SPAN 2^15 keeps the
    # combined key within int32 for |coord| < 16384*threshold (>2.4 km at
    # the 0.15 m reference threshold)
    OFF, SPAN = 1 << 14, 1 << 15
    inv_h = 1.0 / threshold
    fx = jnp.floor(pts[:, 0] * inv_h)
    fy = jnp.floor(pts[:, 1] * inv_h)
    # coordinates beyond the grid span (|coord| >~ 16384*threshold, 2.4 km at
    # the 0.15 m reference cell) are MASKED OUT and counted in dropped —
    # clipping them into border cells would alias far-apart points into
    # spurious cross-pose matches (range-checked in float: an out-of-range
    # float->int32 cast is unspecified)
    in_range = (fx >= -OFF) & (fx < SPAN - OFF) & (fy >= -OFF) & (fy < SPAN - OFF)
    binnable = fmask & in_range
    ix = jnp.where(in_range, fx, 0.0).astype(jnp.int32) + OFF
    iy = jnp.where(in_range, fy, 0.0).astype(jnp.int32) + OFF
    key = jnp.where(binnable, ix * SPAN + iy, INT_MAX)   # masked -> end

    # pre-shuffle so the per-cell capacity cap (rank < bucket) keeps an
    # unbiased pseudo-random sample instead of the lowest pose ids (the
    # stable sort would otherwise keep flat-index order within a cell);
    # affects results only when a cell overflows `bucket`. The permutation
    # depends only on the STATIC M, so it is computed in numpy at trace
    # time — a [M] device argsort costs ~10-20 ms at M=262k, the embedded
    # constant costs nothing (low 31 bits of the int64 product equal the
    # reference int32-wrap formula exactly).
    pos = jnp.arange(M, dtype=jnp.int32)
    perm = jnp.asarray(np.argsort(
        (np.arange(M, dtype=np.int64) * -1640531527) & 0x7FFFFFFF,
        kind="stable").astype(np.int32))
    order = perm[jnp.argsort(key[perm])]              # stable within cells
    skey = key[order]
    is_real = skey != INT_MAX
    is_new = is_real & ((pos == 0) | (skey != jnp.roll(skey, 1)))
    cid = jnp.cumsum(is_new.astype(jnp.int32)) - 1    # compact cell id
    run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    rank = pos - run_start

    slot_ok = is_real & (rank < bucket) & (cid < max_cells)
    dropped = (jnp.sum(is_real & ~slot_ok)
               + jnp.sum(fmask & ~in_range)).astype(jnp.int32)

    # bucket table built by GATHER, not scatter: the sort already grouped
    # points by cell, so cell c's slots are sorted rows cell_start[c] ..
    # cell_start[c]+bucket-1 — contiguous BLOCK gathers (cheap), where the
    # old scatter into a [max_cells*bucket + M]-row dump-slot table cost
    # 13.6 ms (TPU scatter cost scales with destination size). Taking the
    # first `bucket` rows of each run in shuffled-stable order is
    # bit-identical to the old rank < bucket density cap. The 7-channel AoS
    # row (x, y, nx, ny, pose, flat idx, occupied) is the MEASURED winner:
    # composing idx2 = order[slot] and gathering pts[idx2] directly (47.2),
    # or splitting int channels out of the float gather (43.0), both lose
    # to this one fused random-[M,7] + block-[K*B,7] gather chain (38.8) —
    # XLA fuses the AoS chain better than any hand decomposition.
    n_real = jnp.sum(is_real.astype(jnp.int32))
    cell_start = jnp.nonzero(is_new, size=max_cells,
                             fill_value=M)[0].astype(jnp.int32)
    cell_end = jnp.minimum(
        jnp.concatenate([cell_start[1:], jnp.full((1,), M, jnp.int32)]),
        n_real)
    slot_idx = cell_start[:, None] + jnp.arange(bucket, dtype=jnp.int32)
    occ = slot_idx < cell_end[:, None]                 # false for fills too
    pose_id = jnp.repeat(jnp.arange(P, dtype=jnp.int32), N)
    chan = jnp.concatenate([
        pts, nrm,
        pose_id.astype(dtype)[:, None],
        jnp.arange(M, dtype=dtype)[:, None],
        jnp.ones((M, 1), dtype),
    ], axis=1)[order]                                  # ONE fused row gather
    table = jnp.where(occ[:, :, None],
                      chan[jnp.clip(slot_idx, 0, M - 1)],
                      0.0)                             # [K, B, 7] block rows
    p_tab = table[:, :, 0:2]
    n_tab = table[:, :, 2:4]
    pose_tab = table[:, :, 4]
    fidx_tab = table[:, :, 5]

    # sorted occupied-cell keys (ascending since cell_start follows skey
    # order; fills -> INT_MAX at the end)
    skey_pad = jnp.concatenate([skey, jnp.full((1,), INT_MAX, jnp.int32)])
    ucell = jnp.where(cell_start < M, skey_pad[jnp.minimum(cell_start, M)],
                      INT_MAX)

    # recenter all slot coordinates on the OWNING cell's center: pairwise
    # terms then involve only O(threshold)-magnitude values (no |world|^2
    # cancellation in the matmul-expanded distance), and candidate offsets
    # are the known (dx, dy)*h per neighbor step
    kx = ucell // SPAN
    ky = ucell - kx * SPAN
    center = (jnp.stack([kx, ky], -1).astype(dtype)
              - (OFF - 0.5)) * threshold               # [K, 2]
    # unoccupied slots also serve as CANDIDATES in the reverse-offset
    # reduction — push them out of range (their zeroed normals would fail
    # the cos gate anyway, but only for min_cos > 0)
    q_rel = jnp.where(occ[:, :, None], p_tab - center[:, None, :], 1e3)
    q_n = n_tab
    q_pose = pose_tab
    q_idx = fidx_tab

    t2 = threshold * threshold
    # one dump row at index max_cells absorbs reverse-side updates of
    # queries with no such neighbor
    best_d2 = jnp.full((max_cells + 1, bucket), jnp.inf, dtype)
    best_tgt = jnp.zeros((max_cells + 1, bucket), dtype)

    # query-side norms for the matmul-expanded pairwise distances (below)
    qq = jnp.sum(q_rel * q_rel, -1)                   # [K, Bq]

    # ONE concatenated candidate tensor for the whole symmetric half-stencil
    # (center + 4 offsets): f32 lane tiling pads the minor dim to 128, so
    # five separate [K,Bq,64] tiles occupy 5*128 padded lanes while one
    # [K,Bq,320] tile occupies 384 — the VPU processes padding too, so the
    # concat is a ~1.7x cut in gated-distance element slots
    offs = ((1, 0), (0, 1), (1, 1), (1, -1))
    G = 1 + len(offs)
    nbs = [jnp.arange(max_cells, dtype=jnp.int32)]     # center: identity
    oks = [ucell != INT_MAX]
    for dx, dy in offs:
        off = dx * SPAN + dy
        qk = jnp.where(ucell != INT_MAX, ucell + off, INT_MAX)
        nb = jnp.searchsorted(ucell, qk).astype(jnp.int32)
        nb = jnp.minimum(nb, max_cells - 1)
        nbs.append(nb)
        oks.append((ucell[nb] == qk) & (qk != INT_MAX))
    nb_all = jnp.stack(nbs, 1)                         # [K, G]
    ok_all = jnp.stack(oks, 1)                         # [K, G]
    GB = G * bucket
    cand = table[nb_all].reshape(max_cells, GB, 7)     # block-row gather
    cand_p = cand[:, :, 0:2]
    cand_n = cand[:, :, 2:4]
    cand_pose = cand[:, :, 4]
    cand_fidx = cand[:, :, 5]
    cand_occ = cand[:, :, 6] > 0.5
    ok_flat = jnp.broadcast_to(
        ok_all[:, :, None], (max_cells, G, bucket)
    ).reshape(max_cells, GB)

    # gated pairwise distances [K, Bq, G*B]: d2 = |q|^2 + |c|^2 - 2 q.c
    # with the cross terms as ONE batched [K,Bq,2]@[K,2,G*B] matmul (MXU) —
    # the broadcast-subtract-square form materializes a [K,Bq,G*B,2] tile at
    # the VPU's ~40-90 G element-ops/s (NOTES.md), several times slower.
    # Recentered coordinates are O(threshold), so |q|^2+|c|^2-2q.c loses at
    # most ~|coords|^2*eps ~ 1e-8 — far under t2 = 0.0225.
    bad = ~(ok_flat & cand_occ)
    c_rel = jnp.where(bad[:, :, None], 1e3,
                      cand_p - center[:, None, :])
    cc = jnp.sum(c_rel * c_rel, -1)                    # [K, G*B]
    cross = jnp.einsum("kqi,kci->kqc", q_rel, c_rel)
    d2 = qq[:, :, None] + cc[:, None, :] - 2.0 * cross
    cos = jnp.einsum("kqi,kci->kqc", q_n, cand_n)
    good = ((d2 < t2) & (cos > min_cos)
            & (q_pose[:, :, None] != cand_pose[:, None, :]))
    # select-gating + min/hit/max tie-break, NOT argmin/take_along_axis:
    # measured 38.8 vs 60.0 ms/match — TPU lowers the variadic argmin
    # reduce and axis-1 take_along_axis far worse than plain
    # compare/select/max passes
    d2e = jnp.where(good, d2, jnp.inf)                 # [K, Bq, G*B]

    # forward reduction: each query's best over all 5 candidate groups
    dm = jnp.min(d2e, 2)
    hit = (d2e <= dm[:, :, None]) & jnp.isfinite(dm)[:, :, None]
    tm = jnp.max(jnp.where(hit, cand_fidx[:, None, :], -1.0), 2)
    best_d2 = best_d2.at[:max_cells].set(dm)
    best_tgt = best_tgt.at[:max_cells].set(tm)

    # reverse reductions: each +offset tile also serves the opposite offset
    # by reducing its slice over the QUERY axis and scattering to the
    # neighbor's rows (nb is injective per offset -> collision-free), so the
    # 3x3 neighborhood costs one forward + 4 sliced reverse reductions
    for g in range(1, G):
        sl = d2e[:, :, g * bucket:(g + 1) * bucket]
        dmr = jnp.min(sl, 1)                           # [K, Bc]
        hitr = (sl <= dmr[:, None, :]) & jnp.isfinite(dmr)[:, None, :]
        tmr = jnp.max(jnp.where(hitr, q_idx[:, :, None], -1.0), 1)
        rows = jnp.where(oks[g], nbs[g], max_cells)
        old_d = best_d2[rows]
        old_t = best_tgt[rows]
        updr = dmr < old_d
        best_d2 = best_d2.at[rows].set(jnp.where(updr, dmr, old_d))
        best_tgt = best_tgt.at[rows].set(jnp.where(updr, tmr, old_t))

    best_d2 = best_d2[:max_cells]
    best_tgt = best_tgt[:max_cells]

    # read each sorted point's result back from its slot (gather), then
    # unsort via the permutation (collision-free scatter); sorted row pos
    # landed at table[cid, rank] because pos == cell_start[cid] + rank
    safe_slot = jnp.where(slot_ok, cid * bucket + rank, 0)
    d2_sorted = jnp.where(slot_ok, best_d2.reshape(-1)[safe_slot], jnp.inf)
    tgt_sorted = jnp.where(slot_ok, best_tgt.reshape(-1)[safe_slot], 0.0)
    res = jnp.zeros((M, 2), dtype).at[order].set(
        jnp.stack([d2_sorted, tgt_sorted], axis=1))
    valid = jnp.isfinite(res[:, 0])
    return Matches(target=jnp.where(valid, res[:, 1].astype(jnp.int32), 0),
                   valid=valid,
                   # the matmul-expanded |q|^2+|c|^2-2q.c can round slightly
                   # negative for near-coincident points -> clamp before sqrt
                   dist=jnp.sqrt(jnp.maximum(
                       jnp.where(valid, res[:, 0], 0.0), 0.0)),
                   dropped=dropped)


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

    # per-(pose0,pose1) bundle sizes for the RMS normalization + min-10
    # gate: run boundaries in pair-sorted order (cummax/cummin over run
    # starts/ends), then unsort via the permutation — no searchsorted (a
    # [262k] searchsorted costs ~35 ms on this TPU; this is ~2 ms)
    INT_MAX = jnp.iinfo(jnp.int32).max
    pair_key = jnp.where(valid, pose0 * P + pose1, INT_MAX)
    sort_idx = jnp.argsort(pair_key)
    sorted_key = pair_key[sort_idx]
    pos = jnp.arange(M, dtype=jnp.int32)
    is_new = (pos == 0) | (sorted_key != jnp.roll(sorted_key, 1))
    run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    is_last = (pos == M - 1) | (sorted_key != jnp.roll(sorted_key, -1))
    run_end = jax.lax.cummin(jnp.where(is_last, pos, M - 1), reverse=True)
    count_sorted = (run_end - run_start + 1).astype(points.dtype)
    pair_count = jnp.zeros((M,), points.dtype).at[sort_idx].set(count_sorted)
    valid = valid & (pair_count >= min_pair_matches)

    w = (correlation_factor / std_dev) / jnp.sqrt(jnp.maximum(pair_count, 1.0))

    # compact the valid matches into the fixed-capacity table via ONE
    # permutation scatter + per-field gathers: scattering each of the 8
    # field arrays through [capacity+M]-row dump-slot buffers cost ~8 full
    # scatter passes; one int32 scatter (overflow rows OOB-dropped) plus 8
    # gathers of [capacity] rows moves ~10x less memory.
    slots = jnp.cumsum(valid) - 1
    in_cap = valid & (slots < capacity)
    tgt_slot = jnp.where(in_cap, slots, capacity)          # capacity = OOB
    perm = jnp.zeros((capacity,), jnp.int32).at[tgt_slot].set(
        pos, mode="drop")
    filled = jnp.zeros((capacity,), bool).at[tgt_slot].set(
        True, mode="drop")
    perm_tgt = tgt[perm]                # compose index gathers: all field
    f2 = filled[:, None]                # gathers are [capacity]-sized
    return STFFactors(
        pose0=jnp.where(filled, perm // N, 0),
        pose1=jnp.where(filled, perm_tgt // N, 0),
        p0=jnp.where(f2, flat_pts[perm], 0),
        p1=jnp.where(f2, flat_pts[perm_tgt], 0),
        n0=jnp.where(f2, flat_nrm[perm], 0),
        n1=jnp.where(f2, flat_nrm[perm_tgt], 0),
        weight=jnp.where(filled, w[perm], 0),
        valid=filled,
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


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PairMatchInfo:
    """Diagnostics of the per-pair matcher (all device scalars)."""

    n_pairs: Array          # pose pairs that cleared min_pair_matches
    n_matches: Array        # factor rows emitted (pre-capacity)
    grid_dropped: Array     # stage-1 grid capacity/span drops
    pairs_overflow: Array   # voted pairs beyond max_pairs
    rows_overflow: Array    # emitted rows beyond `capacity`


@partial(jax.jit, static_argnames=("max_pairs", "capacity", "pair_chunk",
                                   "bucket", "max_cells",
                                   "min_pair_matches", "elect_impl"))
def pair_match_factors(
    points: Array,       # [P, N, 2] robot frame
    normals: Array,      # [P, N, 2]
    point_mask: Array,   # [P, N]
    poses: Array,        # [P, 3]
    max_pairs: int = 8192,
    capacity: int = 65536,
    threshold: float = POINT_MATCH_THRESHOLD,
    min_cos: float = float(np.cos(MAX_STF_ANGLE_ERROR)),
    std_dev: float = LASER_STD_DEV,
    correlation_factor: float = POINT_CORRELATION_FACTOR,
    min_pair_matches: int = MIN_PAIR_MATCHES,
    pair_chunk: int | None = None,
    bucket: int = 64,
    max_cells: int | None = None,
    elect_impl: str = "top_k",
) -> tuple[STFFactors, PairMatchInfo]:
    """Reference-faithful PER-PAIR STF correspondences.

    The global grid matcher (grid_match) gives each point its single best
    cross-pose neighbor — exact, but on heavily re-traversed maps (many
    laps, or wall sampling coarser than pose spacing) the nearest neighbor
    is an essentially arbitrary choice among near-duplicates, so matches
    fragment across thousands of pose pairs and the reference's
    >=min_pair_matches bundle gate (kMinInterPoseCorrespondence,
    JointOptimization.cpp:563) kills everything. The reference never
    fragments because FindSTFCorrespondences (:561-642) matches each pose
    PAIR with its own KD-tree queries.

    This is that algorithm in TPU form, two stages:
      1. VOTE: grid_match's fragmented output is exactly a proximity vote —
         sort the (min,max) pose-pair keys, count runs, lax.top_k the
         max_pairs most-voted pairs.
      2. MATCH: for each elected pair, one dense [N, N] gated distance tile
         (threshold + normal cone + masks) gives every source point of the
         lower pose its best neighbor in the other — the KD-query loop as
         batched MXU/VPU arithmetic, lax.map'ed in pair_chunk blocks to
         bound the tile to [pair_chunk, N, N].

    Emits one symmetric factor per (pair, source point) with the
    reference's per-bundle RMS weight 1/sqrt(bundle size); bundles below
    min_pair_matches are dropped whole, as in the reference. Pairs use
    canonical (i<j) orientation — the symmetric residual covers both
    directions (see build_stf_factors's halving note).
    """
    from .geometry import pose_to_world, rotate

    P, N, _ = points.shape
    M = P * N
    dtype = points.dtype
    INT_MAX = jnp.iinfo(jnp.int32).max
    if pair_chunk is None:
        # bigger lax.map batches amortize per-step overhead when the [N,N]
        # tiles are small (r4 TPU A/B at P=8192/N=40: 297 ms at 512 ->
        # 261 at 2048, flat at 4096); at N>64 the [chunk,N,N] tile is
        # already 10s of MB, keep the measured-good 512
        pair_chunk = 2048 if N <= 64 else 512

    world = pose_to_world(poses[:, None, :], points)
    wnrm = rotate(poses[:, 2][:, None], normals)

    # ---- stage 1: pair election by global-NN vote -------------------------
    m = grid_match(world, wnrm, point_mask, threshold, min_cos, bucket,
                   max_cells)
    src_pose = jnp.arange(M, dtype=jnp.int32) // N
    tgt_pose = m.target // N
    pi_ = jnp.minimum(src_pose, tgt_pose)
    pj_ = jnp.maximum(src_pose, tgt_pose)
    key = jnp.where(m.valid, pi_ * P + pj_, INT_MAX)   # P^2 < int32 for P<46341
    skey = jnp.sort(key)
    pos = jnp.arange(M, dtype=jnp.int32)
    is_new = (pos == 0) | (skey != jnp.roll(skey, 1))
    run_start = jax.lax.cummax(jnp.where(is_new, pos, 0))
    is_last = ((pos == M - 1) | (skey != jnp.roll(skey, -1))) \
        & (skey != INT_MAX)
    votes = jnp.where(is_last, pos - run_start + 1, -1)
    # top_k requires k <= M; tiny maps (P*N < max_pairs) elect every row
    k = min(max_pairs, M)
    if elect_impl == "argsort":
        # Full stable descending sort + slice. Same election as top_k
        # (both break vote ties by lowest index); kept as a measured
        # alternative in case the variadic top_k reduce lowers badly on
        # TPU at M~300k (cf. the argmin pathology in NOTES).
        order = jnp.argsort(-votes)[:k].astype(jnp.int32)
        topi = order
        topv = votes[order]
    else:
        topv, topi = jax.lax.top_k(votes, k)
    if k < max_pairs:
        topv = jnp.pad(topv, (0, max_pairs - k), constant_values=-1)
        topi = jnp.pad(topi, (0, max_pairs - k))
    pair_ok = topv > 0
    pair_key = skey[topi]
    pi = jnp.where(pair_ok, pair_key // P, 0)
    pj = jnp.where(pair_ok, pair_key % P, 0)
    n_voted = jnp.sum(is_last.astype(jnp.int32))
    pairs_overflow = jnp.maximum(n_voted - k, 0)

    # ---- stage 2: dense per-pair NN ---------------------------------------
    t2 = jnp.asarray(threshold * threshold, dtype)

    def one_pair(args):
        # per-element; lax.map vmaps pair_chunk of these into one
        # [pair_chunk, N, N] tile
        ci, cj, cok = args
        a_pts, b_pts = world[ci], world[cj]              # [N, 2]
        a_nrm, b_nrm = wnrm[ci], wnrm[cj]
        a_msk, b_msk = point_mask[ci], point_mask[cj]
        d2 = jnp.sum((a_pts[:, None, :] - b_pts[None, :, :]) ** 2, -1)
        cosn = a_nrm @ b_nrm.T
        ok = (a_msk[:, None] & b_msk[None, :] & (d2 < t2)
              & (cosn > min_cos) & cok)
        d2m = jnp.where(ok, d2, jnp.inf)
        tgt = jnp.argmin(d2m, axis=1).astype(jnp.int32)  # [N]
        ok_row = jnp.isfinite(jnp.min(d2m, axis=1))
        return tgt, ok_row

    tgt, ok_row = jax.lax.map(one_pair, (pi, pj, pair_ok),
                              batch_size=pair_chunk)     # [K, N] each
    counts = jnp.sum(ok_row, axis=1)                      # [K]
    good = counts >= min_pair_matches
    w_pair = (correlation_factor / std_dev) / jnp.sqrt(
        jnp.maximum(counts.astype(dtype), 1.0))
    valid_rows = ok_row & good[:, None]                   # [K, N]

    # ---- emit + compact ---------------------------------------------------
    K = max_pairs
    p0r = points[pi].reshape(K * N, 2)
    n0r = normals[pi].reshape(K * N, 2)
    p1r = jnp.take_along_axis(points[pj], tgt[:, :, None],
                              axis=1).reshape(K * N, 2)
    n1r = jnp.take_along_axis(normals[pj], tgt[:, :, None],
                              axis=1).reshape(K * N, 2)
    pose0r = jnp.repeat(pi, N)
    pose1r = jnp.repeat(pj, N)
    wr = jnp.repeat(w_pair, N)
    vflat = valid_rows.reshape(K * N)

    slots = jnp.cumsum(vflat) - 1
    in_cap = vflat & (slots < capacity)
    tgt_slot = jnp.where(in_cap, slots, capacity)
    rows = jnp.arange(K * N, dtype=jnp.int32)
    perm = jnp.zeros((capacity,), jnp.int32).at[tgt_slot].set(
        rows, mode="drop")
    filled = jnp.zeros((capacity,), bool).at[tgt_slot].set(True, mode="drop")
    f2 = filled[:, None]
    n_matches = jnp.sum(vflat.astype(jnp.int32))
    factors = STFFactors(
        pose0=jnp.where(filled, pose0r[perm], 0),
        pose1=jnp.where(filled, pose1r[perm], 0),
        p0=jnp.where(f2, p0r[perm], 0),
        p1=jnp.where(f2, p1r[perm], 0),
        n0=jnp.where(f2, n0r[perm], 0),
        n1=jnp.where(f2, n1r[perm], 0),
        weight=jnp.where(filled, wr[perm], 0),
        valid=filled,
    )
    info = PairMatchInfo(
        n_pairs=jnp.sum(good.astype(jnp.int32)),
        n_matches=n_matches,
        grid_dropped=m.dropped,
        pairs_overflow=pairs_overflow,
        rows_overflow=jnp.maximum(n_matches - capacity, 0),
    )
    return factors, info
