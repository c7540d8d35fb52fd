"""Post-human STF refinement solve: dense Gauss-Newton/LM on the MXU.

The reference ships (but never invokes) PostHumanOptimization
(JointOptimization.cpp:1156-1256 — the call site is commented out at
:1353-1373): after the human-constraint solve, find STF correspondences over
all pose pairs and run a second Ceres solve over them. Here it is a live
feature.

STF factors couple arbitrary pose pairs, so the Hessian is no longer
block-tridiagonal. At HitL scales (P <= a few thousand) the TPU-native answer
is a DENSE normal-equation solve: scatter the 3x3 factor blocks into
H [3P, 3P] (37 MB at P=1024) and Cholesky-factor it on the MXU — a few
GFLOPs, microseconds of systolic-array time, no sparsity bookkeeping at all.

By default the solve includes odometry + human + STF factors (strictly
better-posed than the reference's STF-only problem, which is gauge-deficient
beyond the single fixed pose); `stf_only=True` reproduces the reference's
formulation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.state import ConstraintTable
from ..ops import correspond as C
from .joint import build_problem, normal_equations
from .lm import LMConfig

Array = jax.Array


def _dense_from_tridiag(D: Array, U: Array) -> Array:
    P = D.shape[0]
    n = 3 * P
    H = jnp.zeros((n, n), D.dtype)
    r3 = jnp.arange(3)
    i = jnp.arange(P)
    rows = (3 * i)[:, None, None] + r3[None, :, None]
    cols = (3 * i)[:, None, None] + r3[None, None, :]
    H = H.at[rows, cols].add(D)
    j = jnp.arange(P - 1)
    rows = (3 * j)[:, None, None] + r3[None, :, None]
    cols = (3 * (j + 1))[:, None, None] + r3[None, None, :]
    H = H.at[rows, cols].add(U)
    H = H.at[cols.swapaxes(-1, -2), rows.swapaxes(-1, -2)].add(
        jnp.swapaxes(U, -1, -2))
    return H


def _scatter_block(H: Array, bi: Array, bj: Array, block: Array) -> Array:
    r3 = jnp.arange(3)
    rows = (3 * bi)[:, None, None] + r3[None, :, None]
    cols = (3 * bj)[:, None, None] + r3[None, None, :]
    return H.at[rows, cols].add(block)


# one-hot selector budget for the dense-refine assembly (elements per
# [C, P] matrix; 2 are built, f32). 64k factors x 2k poses = 134M = 536 MB.
STF_ONEHOT_BUDGET = 160 * 1024 * 1024


def sort_factors_by_pair(stf: C.STFFactors, P: int):
    """Permute the factor table into (pose0, pose1)-pair order, ONCE per
    solve. Returns (sorted_stf, run_last [C] bool, run_start [C] int32).

    Purpose: the off-diagonal Hessian scatter collides heavily (every factor
    of a pose pair hits the same 3x3 block, and TPU scatter-add serializes
    colliding updates — measured ~9 ms of the 15 ms dense assembly). In pair
    order the per-pair block sums come from a cumsum + two gathers, and only
    ONE row per pair scatters — all targets unique."""
    Cn = stf.pose0.shape[0]
    key = jnp.where(stf.valid, stf.pose0 * P + stf.pose1,
                    jnp.iinfo(jnp.int32).max)
    idx = jnp.argsort(key)
    f = jax.tree_util.tree_map(lambda a: a[idx], stf)
    skey = key[idx]
    pos = jnp.arange(Cn, dtype=jnp.int32)
    is_new = (pos == 0) | (skey != jnp.roll(skey, 1))
    run_start = lax.cummax(jnp.where(is_new, pos, 0))
    run_last = ((pos == Cn - 1) | (skey != jnp.roll(skey, -1))) & f.valid
    return f, run_last, run_start


def compact_pair_rows(stf: C.STFFactors, run_last: Array, P: int,
                      max_pairs: int = 16384):
    """Gather indices of the pair-representative (run-last) rows, compacted
    to a static `max_pairs` capacity — built ONCE per solve.

    Motivation (measured, v5e): the off-diagonal scatter processes every
    index row whether dropped or not, so scattering from the full [C]-row
    table costs ~6 ms/LM-iteration at C=65536 even though only ~2.4k rows
    are real pairs at bench shapes; gathering the representatives into a
    [max_pairs] table first cuts that to <1 ms.

    Returns (idx [max_pairs] row indices with fill=C, bi, bj [max_pairs]
    destination pose indices with fill=P (OOB -> dropped by the scatter),
    dropped = #pairs beyond capacity)."""
    Cn = run_last.shape[0]
    idx = jnp.nonzero(run_last, size=max_pairs,
                      fill_value=Cn)[0].astype(jnp.int32)
    npairs = jnp.sum(run_last.astype(jnp.int32))
    dropped = jnp.maximum(npairs - max_pairs, 0)
    oob = jnp.full((1,), P, jnp.int32)
    pi0 = jnp.concatenate([stf.pose0, oob])
    pi1 = jnp.concatenate([stf.pose1, oob])
    # fill rows get DISTINCT out-of-bounds destinations (P + slot): every
    # consumer scatters with unique_indices=True, and a shared P would make
    # that promise false (JAX documents UB for violated uniqueness, even
    # though mode="drop" discards these rows today)
    fill_oob = P + jnp.arange(max_pairs, dtype=jnp.int32)
    filled_row = idx < Cn
    bi = jnp.where(filled_row, pi0[idx], fill_oob)
    bj = jnp.where(filled_row, pi1[idx], fill_oob)
    return idx, bi, bj, dropped


def stf_onehots(stf: C.STFFactors, P: int, dtype) -> tuple | None:
    """[C, P] selectors for the factor->pose reductions, or None when over
    budget. Invalid rows point at pose 0 but carry zero Jacobians."""
    Cn = stf.pose0.shape[0]
    if Cn * P > STF_ONEHOT_BUDGET:
        return None
    r = jnp.arange(P)[None, :]
    return ((stf.pose0[:, None] == r).astype(dtype),
            (stf.pose1[:, None] == r).astype(dtype))


def _stf_scalar_products(stf: C.STFFactors, poses: Array):
    """STF residual/Jacobian products in flat [C]-lane SoA form.

    Returns (X0cat [C,12], X1cat [C,12], X2 [C,9], sqcost [C]):
      X0cat = [vec(J0^T J0) | J0^T r],  X1cat = [vec(J1^T J1) | J1^T r],
      X2 = vec(J0^T J1),  sqcost = |r|^2 per factor.

    Motivation (measured): the [C,2,3]/[C,3,3] block intermediates of the
    AoS path tile the (8,128) vector registers at ~1/100 occupancy — a
    [65536,3,3] array is 268 MB physical — and assemble_dense spent
    ~12 ms/LM-iteration in them. Scalar lanes + [C,12]/[C,9] stacks feed
    the same one-hot MXU reductions at a fraction of the traffic."""
    q0 = poses[stf.pose0]
    q1 = poses[stf.pose1]
    c0_, s0_ = jnp.cos(q0[:, 2]), jnp.sin(q0[:, 2])
    c1_, s1_ = jnp.cos(q1[:, 2]), jnp.sin(q1[:, 2])
    # rotated robot-frame points/normals (world minus own translation)
    r0x = c0_ * stf.p0[:, 0] - s0_ * stf.p0[:, 1]
    r0y = s0_ * stf.p0[:, 0] + c0_ * stf.p0[:, 1]
    r1x = c1_ * stf.p1[:, 0] - s1_ * stf.p1[:, 1]
    r1y = s1_ * stf.p1[:, 0] + c1_ * stf.p1[:, 1]
    n0x = c0_ * stf.n0[:, 0] - s0_ * stf.n0[:, 1]
    n0y = s0_ * stf.n0[:, 0] + c0_ * stf.n0[:, 1]
    n1x = c1_ * stf.n1[:, 0] - s1_ * stf.n1[:, 1]
    n1y = s1_ * stf.n1[:, 0] + c1_ * stf.n1[:, 1]
    dpx = (r1x + q1[:, 0]) - (r0x + q0[:, 0])
    dpy = (r1y + q1[:, 1]) - (r0y + q0[:, 1])
    vm = stf.weight * stf.valid.astype(poses.dtype)
    rr0 = vm * (n0x * dpx + n0y * dpy)
    rr1 = vm * (n1x * dpx + n1y * dpy)
    # dp0_dth = perp(R p0) = (-r0y, r0x); dn0_dth = (-n0y, n0x); etc.
    n0_dp0 = -n0x * r0y + n0y * r0x
    n1_dp0 = -n1x * r0y + n1y * r0x
    n0_dp1 = -n0x * r1y + n0y * r1x
    n1_dp1 = -n1x * r1y + n1y * r1x
    dn0_dp = -n0y * dpx + n0x * dpy
    dn1_dp = -n1y * dpx + n1x * dpy
    # J0 rows (d r0/d pose0, d r1/d pose0), J1 rows (wrt pose1)
    a0 = (-vm * n0x, -vm * n0y, vm * (dn0_dp - n0_dp0))
    a1 = (-vm * n1x, -vm * n1y, -vm * n1_dp0)
    b0 = (vm * n0x, vm * n0y, vm * n0_dp1)
    b1 = (vm * n1x, vm * n1y, vm * (dn1_dp + n1_dp1))
    X0cat = jnp.stack(
        [a0[p] * a0[q] + a1[p] * a1[q] for p in range(3) for q in range(3)]
        + [a0[p] * rr0 + a1[p] * rr1 for p in range(3)], axis=-1)
    X1cat = jnp.stack(
        [b0[p] * b0[q] + b1[p] * b1[q] for p in range(3) for q in range(3)]
        + [b0[p] * rr0 + b1[p] * rr1 for p in range(3)], axis=-1)
    X2 = jnp.stack(
        [a0[p] * b0[q] + a1[p] * b1[q] for p in range(3) for q in range(3)],
        axis=-1)
    return X0cat, X1cat, X2, rr0 * rr0 + rr1 * rr1


def _segmented_pair_sums(X: Array, run_start: Array, block: int = 512) -> Array:
    """Per-run inclusive sums sum(X[run_start[i]..i]) for every row i, via a
    TWO-LEVEL blocked cumsum.

    A single global cumsum difference cs[i]-cs[run_start-1] carries the error
    of the GLOBAL prefix magnitude (sum over all factors, ~1e6 with typical
    STF weights) — small late pairs can lose several f32 digits. Blocking
    resets the accumulator every `block` rows: within-block runs difference
    only local prefixes (error ~block*eps of LOCAL magnitude); runs straddling
    one boundary add two local partials and an exactly-zero middle; only runs
    spanning >=3 blocks touch the block-level prefix, and those runs' own sums
    are comparable to the blocks they span."""
    Cn, K = X.shape
    nb = -(-Cn // block)
    pad = nb * block - Cn
    Xp = jnp.pad(X, ((0, pad), (0, 0)))
    lcs = jnp.cumsum(Xp.reshape(nb, block, K), axis=1)      # [nb, block, K]
    btot = lcs[:, -1, :]                                    # [nb, K]
    off = jnp.cumsum(btot, axis=0) - btot                   # exclusive prefix
    lcs_f = lcs.reshape(nb * block, K)[:Cn]
    pos = jnp.arange(Cn, dtype=jnp.int32)
    a = run_start - 1                                       # exclusive lower
    bi = pos // block
    ba = jnp.where(a >= 0, a // block, -1)
    Ea = jnp.where((a >= 0)[:, None], lcs_f[jnp.maximum(a, 0)], 0.0)
    tail = jnp.where((ba >= 0)[:, None],
                     btot[jnp.maximum(ba, 0)] - Ea, 0.0)
    mid = off[bi] - off[jnp.clip(ba + 1, 0, nb - 1)]        # 0 when adjacent
    return jnp.where((ba == bi)[:, None], lcs_f - Ea, tail + mid + lcs_f)


def assemble_dense(
    problem,
    stf: C.STFFactors,
    poses: Array,
    include_chain: bool = True,
    onehots: tuple | None = None,
    pair_runs: tuple | None = None,
    pair_compact: tuple | None = None,
) -> tuple[Array, Array, Array]:
    """Dense H [3P,3P], gradient g [3P], cost — odometry+human (optional)
    + STF factors at `poses`.

    With `onehots` (built once per solve by stf_onehots), the per-pose
    diagonal blocks and gradient ride the MXU as [P, C] @ [C, 12]
    contractions and the off-diagonal coupling costs ONE block scatter plus
    a dense transpose — TPU scatter-add serializes on colliding indices, so
    this replaces 4 colliding scatters + 2 gradient scatters per LM
    iteration with 1.

    With `pair_runs` (= (run_last, run_start) from sort_factors_by_pair;
    requires `stf` pair-sorted), even that one scatter becomes
    collision-free: per-pair block sums come from a blocked segmented cumsum
    (_segmented_pair_sums — error stays LOCAL to each run, not the global
    prefix magnitude) and only the last row of each pair run scatters its
    block (unique targets; non-last rows dropped via OOB indices)."""
    P = poses.shape[0]
    n = 3 * P
    dtype = poses.dtype

    if include_chain:
        D, U, g_blocks, cost = normal_equations(problem, poses)
        H = _dense_from_tridiag(D, U)
        g = g_blocks.reshape(n)
    else:
        H = jnp.zeros((n, n), dtype)
        g = jnp.zeros((n,), dtype)
        cost = jnp.zeros((), dtype)

    if onehots is not None:
        oh0, oh1 = onehots
        Cn = stf.pose0.shape[0]
        X0, X1, X2, sq = _stf_scalar_products(stf, poses)
        Y = oh0.T @ X0 + oh1.T @ X1            # [P, 12] on the MXU
        D_stf = Y[:, :9].reshape(P, 3, 3)
        g_stf = Y[:, 9:]
        r3 = jnp.arange(3)
        i = jnp.arange(P)
        rows = (3 * i)[:, None, None] + r3[None, :, None]
        cols = (3 * i)[:, None, None] + r3[None, None, :]
        H = H.at[rows, cols].add(D_stf)        # unique indices
        if pair_runs is not None:
            run_last, run_start = pair_runs
            seg = _segmented_pair_sums(X2, run_start)
            if pair_compact is not None:
                # gather the <=max_pairs representative rows first: the
                # scatter pays per INDEX ROW (dropped or not), so shrinking
                # the index table from C to max_pairs is ~6x/LM-iter here
                idx, bi, bj = pair_compact
                segp = jnp.concatenate([seg, jnp.zeros((1, 9), dtype)], 0)
                blocks = segp[idx].reshape(idx.shape[0], 3, 3)
                rows_o = (3 * bi)[:, None, None] + r3[None, :, None]
                cols_o = (3 * bj)[:, None, None] + r3[None, None, :]
                # targets unique by construction (one row per pose pair):
                # scatter-SET into zeros == scatter-add, minus the
                # read-modify-write
                H_off = jnp.zeros((n, n), dtype).at[rows_o, cols_o].set(
                    blocks, mode="drop", unique_indices=True)
            else:
                blocks = seg.reshape(Cn, 3, 3)
                bi = jnp.where(run_last, stf.pose0, P)  # P -> OOB, dropped
                rows_o = (3 * bi)[:, None, None] + r3[None, :, None]
                cols_o = (3 * stf.pose1)[:, None, None] + r3[None, None, :]
                H_off = jnp.zeros((n, n), dtype).at[rows_o, cols_o].add(
                    blocks, mode="drop")
        else:
            H_off = _scatter_block(jnp.zeros((n, n), dtype),
                                   stf.pose0, stf.pose1,
                                   X2.reshape(Cn, 3, 3))
        H = H + H_off + H_off.T
        g = (g.reshape(P, 3) + g_stf).reshape(n)
        cost = cost + 0.5 * jnp.sum(sq)
    else:
        r = C.stf_residuals(stf, poses)            # [Cf, 2]
        J0, J1 = C.stf_jacobians(stf, poses)       # [Cf, 2, 3]
        J0T, J1T = jnp.swapaxes(J0, -1, -2), jnp.swapaxes(J1, -1, -2)
        H = _scatter_block(H, stf.pose0, stf.pose0, J0T @ J0)
        H = _scatter_block(H, stf.pose1, stf.pose1, J1T @ J1)
        H = _scatter_block(H, stf.pose0, stf.pose1, J0T @ J1)
        H = _scatter_block(H, stf.pose1, stf.pose0, J1T @ J0)
        g = g.reshape(P, 3).at[stf.pose0].add(
            (J0T @ r[..., None])[..., 0]
        ).at[stf.pose1].add((J1T @ r[..., None])[..., 0]).reshape(n)
        cost = cost + 0.5 * jnp.sum(r * r)

    # gauge fix pose 0
    eye = jnp.eye(3, dtype=dtype)
    H = H.at[:3, :].set(0.0).at[:, :3].set(0.0).at[:3, :3].set(eye)
    g = g.at[:3].set(0.0)
    return H, g, cost


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class STFSolveResult:
    poses: Array
    final_cost: Array
    initial_cost: Array
    iterations: Array
    num_matches: Array
    # pose pairs beyond the solvers' compacted off-diagonal capacity
    # (0 = exact; ADVICE r2: capacity violations must be detectable)
    pairs_dropped: Array | None = None
    # factor rows genuinely lost before the solve: the global matcher's
    # density-cap/out-of-range drops, or the pair matcher's factor-table
    # overflow (same ADVICE-r2 detectability rule)
    match_dropped: Array | None = None
    # pair-matcher only: stage-1 grid drops that may have silenced a pair's
    # VOTE (the pair itself then never elected — distinct from lost rows)
    vote_dropped: Array | None = None
    # pair-matcher only: voted pose pairs beyond the election capacity
    # (units: pairs, each worth up to N rows — kept separate from
    # match_dropped's row units)
    elect_dropped: Array | None = None


# ---------------------------------------------------------------------------
# matrix-free path: PCG on (chain tridiagonal + STF diag) with the STF
# off-diagonal coupling applied PAIR-BLOCK-wise — no [3P,3P] ever
# materializes. At P=8192 the dense Hessian would be 2.4 GB; this path is
# O(P + C) per LM iteration and O(P + n_pairs) per CG iteration.
#
# Everything is collision-free (TPU scatter-add serializes colliding
# updates — the measured pathology the dense path's pair-sort removed):
# per-pose and per-pair reductions ride sorted-run segmented sums
# (_segmented_pair_sums) followed by unique-target scatters, and the CG
# matvec works on the <=max_pairs compacted 3x3 pair blocks instead of the
# [C]-row factor table.
# ---------------------------------------------------------------------------

_INT32_MAX = 2147483647


def _sorted_runs(keys: Array, size: int):
    """Run boundaries over an ASCENDING-sorted int32 key vector (invalid
    rows = INT32_MAX, sorted to the tail). Returns (run_start [N] — index
    of each row's run head, rep_idx [size] — row index of each run's LAST
    row, fill=N for unused slots — gather through a zero-padded array)."""
    N = keys.shape[0]
    pos = jnp.arange(N, dtype=jnp.int32)
    is_new = (pos == 0) | (keys != jnp.roll(keys, 1))
    run_start = lax.cummax(jnp.where(is_new, pos, 0))
    valid = keys != _INT32_MAX
    run_last = ((pos == N - 1) | (keys != jnp.roll(keys, -1))) & valid
    rep_idx = jnp.nonzero(run_last, size=size,
                          fill_value=N)[0].astype(jnp.int32)
    return run_start, rep_idx


def _pcg_reductions(stf_s: C.STFFactors, run_start_pair: Array,
                    pair_compact: tuple, P: int):
    """Once-per-solve orderings for the collision-free PCG assembly/matvec.

    `stf_s` must be pair-sorted (sort_factors_by_pair), so pose0 is already
    ascending; pose1 needs its own permutation. The compacted pair table
    (cbi ascending by construction) gets bi-runs directly and bj-runs via a
    second <=max_pairs permutation."""
    cidx, cbi, cbj = pair_compact

    def _dst(keys_padded, rep):
        # distinct OOB fills (P + slot) keep the consumers' unique_indices
        # promise honest (see compact_pair_rows)
        n = rep.shape[0]
        d = keys_padded[jnp.minimum(rep, keys_padded.shape[0] - 1)]
        fill = (rep >= keys_padded.shape[0] - 1) | (d >= P)
        return jnp.where(fill, P + jnp.arange(n, dtype=jnp.int32), d)

    key0 = jnp.where(stf_s.valid, stf_s.pose0, _INT32_MAX)
    run_start_p0, rep_p0 = _sorted_runs(key0, P)
    oobP = jnp.full((1,), P, jnp.int32)
    dst_p0 = _dst(jnp.concatenate([stf_s.pose0, oobP]), rep_p0)
    key1 = jnp.where(stf_s.valid, stf_s.pose1, _INT32_MAX)
    ord1 = jnp.argsort(key1).astype(jnp.int32)
    run_start_p1, rep_p1 = _sorted_runs(key1[ord1], P)
    dst_p1 = _dst(jnp.concatenate([stf_s.pose1[ord1], oobP]), rep_p1)
    # pair-table runs: grouped by destination pose0 (bi) and pose1 (bj)
    run_start_bi, rep_bi = _sorted_runs(
        jnp.where(cbi < P, cbi, _INT32_MAX), P)
    dst_bi = _dst(jnp.concatenate([cbi, oobP]), rep_bi)
    ordp1 = jnp.argsort(jnp.where(cbj < P, cbj, _INT32_MAX)).astype(jnp.int32)
    cbj_o = cbj[ordp1]
    cbi_o = cbi[ordp1]
    run_start_bj, rep_bj = _sorted_runs(
        jnp.where(cbj_o < P, cbj_o, _INT32_MAX), P)
    dst_bj = _dst(jnp.concatenate([cbj_o, oobP]), rep_bj)
    return dict(run_start_pair=run_start_pair, cidx=cidx, cbi=cbi, cbj=cbj,
                run_start_p0=run_start_p0, rep_p0=rep_p0, dst_p0=dst_p0,
                ord1=ord1, run_start_p1=run_start_p1, rep_p1=rep_p1,
                dst_p1=dst_p1, run_start_bi=run_start_bi, rep_bi=rep_bi,
                dst_bi=dst_bi, ordp1=ordp1, cbi_o=cbi_o,
                run_start_bj=run_start_bj, rep_bj=rep_bj, dst_bj=dst_bj)


def _stf_system_compact(stf_s: C.STFFactors, x: Array, red: dict):
    """Per-pose STF diag blocks [P,3,3] + gradient [P,3] + cost, and the
    compacted per-pair off-diagonal blocks B [max_pairs,3,3] — one
    [C]-row factor pass, every reduction a segmented sum + unique scatter.
    Pose-0 contributions zeroed (gauge)."""
    P = x.shape[0]
    dtype = x.dtype
    X0, X1, X2, sq = _stf_scalar_products(stf_s, x)
    z12 = jnp.zeros((1, 12), dtype)
    seg0 = _segmented_pair_sums(X0, red["run_start_p0"])
    Y0 = jnp.concatenate([seg0, z12], 0)[red["rep_p0"]]       # [P, 12]
    Dh = jnp.zeros((P, 3, 3), dtype).at[red["dst_p0"]].set(
        Y0[:, :9].reshape(-1, 3, 3), mode="drop", unique_indices=True)
    g = jnp.zeros((P, 3), dtype).at[red["dst_p0"]].set(
        Y0[:, 9:], mode="drop", unique_indices=True)
    seg1 = _segmented_pair_sums(X1[red["ord1"]], red["run_start_p1"])
    Y1 = jnp.concatenate([seg1, z12], 0)[red["rep_p1"]]
    Dh = Dh.at[red["dst_p1"]].add(Y1[:, :9].reshape(-1, 3, 3),
                                  mode="drop", unique_indices=True)
    g = g.at[red["dst_p1"]].add(Y1[:, 9:], mode="drop", unique_indices=True)
    segp = _segmented_pair_sums(X2, red["run_start_pair"])
    B = jnp.concatenate([segp, jnp.zeros((1, 9), dtype)], 0)[red["cidx"]]
    Dh = Dh.at[0].set(0.0)
    g = g.at[0].set(0.0)
    return Dh, g, 0.5 * jnp.sum(sq), B.reshape(-1, 3, 3)


def _pair_block_matvec(B: Array, red: dict, P: int):
    """v [P,3] -> off-diagonal STF Hessian product from the compacted pair
    blocks: out[bi] += B v[bj], out[bj] += B^T v[bi]; gauge row 0 projected
    out. O(max_pairs) per call — the CG hot loop never touches [C] rows."""
    cbj = red["cbj"]
    cbi_o = red["cbi_o"]
    Bt = B[red["ordp1"]]

    def mv(v):
        vz = v.at[0].set(0.0)
        # fill rows carry zero blocks, so the clamped OOB gather is harmless
        y = jnp.einsum("kab,kb->ka", B, vz[jnp.minimum(cbj, P - 1)])
        segy = _segmented_pair_sums(y, red["run_start_bi"])
        Yb = jnp.concatenate([segy, jnp.zeros((1, 3), v.dtype)],
                             0)[red["rep_bi"]]
        out = jnp.zeros((P, 3), v.dtype).at[red["dst_bi"]].set(
            Yb, mode="drop", unique_indices=True)
        yt = jnp.einsum("kab,ka->kb", Bt, vz[jnp.minimum(cbi_o, P - 1)])
        segyt = _segmented_pair_sums(yt, red["run_start_bj"])
        Yt = jnp.concatenate([segyt, jnp.zeros((1, 3), v.dtype)],
                             0)[red["rep_bj"]]
        out = out.at[red["dst_bj"]].add(Yt, mode="drop", unique_indices=True)
        return out.at[0].set(0.0)

    return mv


def _mnt_updates(config: LMConfig, dtype, c, c_new, step, diag, g, mu, nu, x):
    """Shared Madsen-Nielsen-Tingleff acceptance/damping/termination block
    for the STF LM drivers (dense two-pass, dense fused, PCG) — one copy so
    trust-region tuning cannot silently diverge between them.
    Returns (accept, mu_out, nu_out, done)."""
    pred = 0.5 * jnp.sum(step * (mu * diag * step - g))
    rho = (c - c_new) / jnp.maximum(pred, 1e-30)
    accept = (rho > 0) & jnp.isfinite(c_new)
    factor = jnp.maximum(1.0 / 3.0,
                         1.0 - (2.0 * rho - 1.0) ** 3).astype(dtype)
    mu_out = jnp.clip(jnp.where(accept, mu * factor, mu * nu), 1e-32, 1e32)
    nu_out = jnp.where(accept, jnp.asarray(2.0, dtype), nu * 2.0)
    fdone = accept & (jnp.abs(c - c_new) <= config.function_tolerance * c)
    sdone = accept & (jnp.linalg.norm(step) <= config.parameter_tolerance
                      * (jnp.linalg.norm(x) + config.parameter_tolerance))
    mdone = mu_out >= config.mu_collapse
    return accept, mu_out, nu_out, fdone | sdone | mdone


@partial(jax.jit, static_argnames=("config", "include_chain", "max_pairs",
                                   "precondition", "cg_tolerance",
                                   "cg_max_iterations"))
def stf_pcg_lm_solve(
    poses0: Array,
    table: ConstraintTable,
    stf: C.STFFactors,
    config: LMConfig = LMConfig(max_iterations=30),
    include_chain: bool = True,
    max_pairs: int = 16384,
    precondition: str = "tridiag",
    cg_tolerance: float = 1e-2,
    cg_max_iterations: int | None = None,
) -> STFSolveResult:
    """Matrix-free LM: same problem as stf_lm_solve, linear solves by
    block-Jacobi PCG (solver/cg.py) instead of a dense factorization.

    The Hessian action is applied through the compacted pair blocks
    (<=max_pairs 3x3 blocks, _pair_block_matvec), so a CG iteration costs
    O(P + n_pairs) with zero colliding scatters — the [C]-row factor table
    is touched once per LM iteration (_stf_system_compact), not once per
    CG iteration."""
    from .cg import pcg_solve
    from .joint import cost as chain_cost

    dtype = poses0.dtype
    P = poses0.shape[0]
    problem = build_problem(poses0, table)

    # once per solve: pair-sort + run orderings for the collision-free
    # reductions (same machinery as the dense path's compacted assembly)
    stf_s, run_last, run_start_pair = sort_factors_by_pair(stf, P)
    cidx, cbi, cbj, pairs_dropped = compact_pair_rows(stf_s, run_last, P,
                                                      max_pairs=max_pairs)
    red = _pcg_reductions(stf_s, run_start_pair, (cidx, cbi, cbj), P)

    def cost_only(x):
        c = chain_cost(problem, x) if include_chain else jnp.zeros((), dtype)
        r = C.stf_residuals(stf_s, x)
        return c + 0.5 * jnp.sum(r * r)

    c0 = cost_only(poses0)

    def assemble_all(x):
        """Chain + STF system at x: (D_aug [P,3,3], U [P-1,3,3],
        g_tot [P,3], B pair blocks)."""
        if include_chain:
            D, U, g, _ = normal_equations(problem, x)
        else:
            # gauge: pin pose 0 like the dense path
            D = jnp.zeros((P, 3, 3), dtype).at[0].set(jnp.eye(3, dtype=dtype))
            U = jnp.zeros((P - 1, 3, 3), dtype)
            g = jnp.zeros((P, 3), dtype)
        Dh, gh, _, B = _stf_system_compact(stf_s, x, red)
        return D + Dh, U, g + gh, B

    sys0 = assemble_all(poses0)

    def body(state):
        x, (D_aug, U, g_tot, B), mu, nu, c, it, done = state
        # the system is always valid at the current x — a REJECTED step
        # leaves x unchanged, so only mu changes and the (dominant) [C]-row
        # factor pass is skipped; lax.cond below reassembles on accept only
        diag = jnp.clip(jnp.diagonal(D_aug, axis1=-2, axis2=-1),
                        config.min_diagonal, config.max_diagonal)
        D_damped = D_aug + mu * jax.vmap(jnp.diag)(diag)
        # "tridiag" preconditioning solves the damped chain+diag part
        # EXACTLY per CG apply (BCR), so iterations scale with the pair
        # coupling strength only — measured ~an order fewer iterations
        # than block-Jacobi on loop-closure-heavy maps; the cap reflects it.
        # cg_tolerance defaults LOOSE (1e-2): the linear solve only feeds an
        # LM trust-region step, and inexact-Newton theory (and the r4 A/B)
        # says a 1e-2 relative residual leaves the LM trajectory unchanged
        # while cutting CG sweeps several-fold vs the old 1e-5.
        step, _res, _cgit = pcg_solve(
            D_damped, U, -g_tot,
            extra_matvec=_pair_block_matvec(B, red, P),
            max_iterations=(cg_max_iterations if cg_max_iterations
                            is not None else
                            (64 if precondition == "tridiag" else 200)),
            tolerance=cg_tolerance, preconditioner=precondition,
        )
        x_new = x + step
        c_new = cost_only(x_new)
        accept, mu, nu, done_new = _mnt_updates(
            config, dtype, c, c_new, step, diag, g_tot, mu, nu, x)
        x = jnp.where(accept, x_new, x)
        c_next = jnp.where(accept, c_new, c)
        done = done | done_new
        sys_ = lax.cond(accept & ~done, assemble_all,
                        lambda _x: (D_aug, U, g_tot, B), x)
        return x, sys_, mu, nu, c_next, it + 1, done

    def cond(state):
        _, _, _, _, _, it, done = state
        return (it < config.max_iterations) & ~done

    init = (poses0, sys0, jnp.asarray(config.initial_mu, dtype),
            jnp.asarray(2.0, dtype), c0, jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    x, _, _, _, c, it, _ = lax.while_loop(cond, body, init)
    return STFSolveResult(
        poses=x, final_cost=c, initial_cost=c0, iterations=it,
        num_matches=jnp.sum(stf_s.valid), pairs_dropped=pairs_dropped,
    )


@partial(jax.jit, static_argnames=("config", "include_chain", "fused_eval",
                                   "max_pairs"))
def stf_lm_solve(
    poses0: Array,
    table: ConstraintTable,
    stf: C.STFFactors,
    config: LMConfig = LMConfig(max_iterations=30),
    include_chain: bool = True,
    fused_eval: bool = False,
    max_pairs: int = 16384,
) -> STFSolveResult:
    """Dense STF LM.

    `fused_eval=True` evaluates the trial cost FROM the assembly
    (assemble_dense returns cost as a byproduct of the same factor pass):
    one [C]-row pass per iteration instead of cost_only + a second assembly
    pass on accepted steps. The trade: rejected steps pay the full assembly
    (MXU contractions + off-diag scatter) where the two-pass form pays only
    the residual reduction — profitable when the acceptance rate is high
    (the typical fine-alignment regime). Default False until TPU-measured.
    """
    dtype = poses0.dtype
    problem = build_problem(poses0, table)

    def cost_only(x):
        if include_chain:
            from .joint import cost as chain_cost

            c = chain_cost(problem, x)
        else:
            c = jnp.zeros((), dtype)
        r = C.stf_residuals(stf, x)
        return c + 0.5 * jnp.sum(r * r)

    # once per solve: pair-sort the factor table (collision-free off-diag
    # assembly), build the [C,P] one-hot selectors from the sorted table,
    # and compact the pair-representative rows (scatter cost is per index
    # row — measured 6.6 -> <1 ms/LM-iter at C=65536, ~2.4k real pairs)
    P_ = poses0.shape[0]
    stf, run_last, run_start = sort_factors_by_pair(stf, P_)
    pair_runs = (run_last, run_start)
    onehots = stf_onehots(stf, P_, dtype)
    cidx, cbi, cbj, pairs_dropped = compact_pair_rows(stf, run_last, P_,
                                                      max_pairs=max_pairs)
    pair_compact = (cidx, cbi, cbj)

    def assemble_cost(x):
        return assemble_dense(problem, stf, x, include_chain, onehots,
                              pair_runs, pair_compact)

    def assemble(x):
        H, g, _ = assemble_cost(x)
        return H, g

    if fused_eval:
        H0, g0, c0 = assemble_cost(poses0)
    else:
        c0 = cost_only(poses0)
        H0, g0 = assemble(poses0)

    def _solve_step(H, g, mu):
        diag = jnp.clip(jnp.diagonal(H), config.min_diagonal,
                        config.max_diagonal)
        Hd = H + mu * jnp.diag(diag)
        # SPD by construction (PSD normal equations + gauge identity block
        # + positive damping): Cholesky + two triangular solves, measured
        # 3.5x faster than jnp.linalg.solve's LU at [3072, 3072]
        L = jnp.linalg.cholesky(Hd)
        y = jax.scipy.linalg.solve_triangular(L, -g[:, None], lower=True)
        step = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False)[:, 0]
        return step, diag

    def body(state):
        x, H, g, mu, nu, c, it, done = state
        # H, g are always valid at the current x: a REJECTED step leaves x
        # unchanged, so only mu changes and the (dominant) assembly is
        # skipped — lax.cond below re-assembles on accepted steps only
        step, diag = _solve_step(H, g, mu)
        x_new = x + step.reshape(-1, 3)
        c_new = cost_only(x_new)
        accept, mu, nu, done_new = _mnt_updates(
            config, dtype, c, c_new, step, diag, g, mu, nu, x)
        x = jnp.where(accept, x_new, x)
        c_next = jnp.where(accept, c_new, c)
        done = done | done_new
        H, g = lax.cond(accept & ~done,
                        lambda xx: assemble(xx), lambda xx: (H, g), x)
        return x, H, g, mu, nu, c_next, it + 1, done

    def body_fused(state):
        x, H, g, mu, nu, c, it, done = state
        step, diag = _solve_step(H, g, mu)
        x_new = x + step.reshape(-1, 3)
        # ONE factor pass: trial H/g/cost together; keep them only on accept
        H_new, g_new, c_new = assemble_cost(x_new)
        accept, mu, nu, done_new = _mnt_updates(
            config, dtype, c, c_new, step, diag, g, mu, nu, x)
        x = jnp.where(accept, x_new, x)
        c_next = jnp.where(accept, c_new, c)
        H = jnp.where(accept, H_new, H)
        g = jnp.where(accept, g_new, g)
        return x, H, g, mu, nu, c_next, it + 1, done | done_new

    def cond(state):
        return (state[6] < config.max_iterations) & ~state[7]

    init = (poses0, H0, g0, jnp.asarray(config.initial_mu, dtype),
            jnp.asarray(2.0, dtype), c0, jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    x, _, _, _, _, c, it, _ = lax.while_loop(
        cond, body_fused if fused_eval else body, init)
    return STFSolveResult(
        poses=x, final_cost=c, initial_cost=c0, iterations=it,
        num_matches=jnp.sum(stf.valid), pairs_dropped=pairs_dropped,
    )
