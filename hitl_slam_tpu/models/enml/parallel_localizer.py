"""Checkerboard-parallel EnML batch localizer.

TPU-first alternative to the sequential sliding-window sweep in
localizer.batch_localize (VectorMapping::BatchLocalize,
vector_mapping.cpp:2673-2911). The reference's outer loop is inherently
sequential — each window's seed depends on the previous window's solution.
This module replaces that chain with a red/black (checkerboard) domain
decomposition over the trajectory:

  1. The trajectory is tiled into DISJOINT windows of W poses, at offsets 0
     (even parity) and W//2 (odd parity). All windows of one parity are
     independent given current pose estimates, so they are solved as ONE
     batched GN problem (vmap over windows, chunked to bound the match
     matrix's memory).
  2. The sequential sweep's forward seeding is recovered exactly (to rigid
     motion) by an SE(2) prefix-composition carry: each window k yields a
     boundary correction dT_k = T_new(last) . T_old(last)^-1; window j's
     solved block is premultiplied by carry_j = dT_0 ... dT_{j-1}
     (log-depth jax.lax.associative_scan over homogeneous 3x3 matrices).
     Rigid carries preserve every within-window factor (odometry + STF are
     relative), so each window's local optimum survives the stitch.
  3. Alternating parities covers the cross-boundary odometry/STF factors;
     `n_passes` even/odd rounds replace the reference's convergence loop.

Window matching: brute [M,M] for small windows (W*N <= brute_match_limit),
else the grid-hash matcher (ops/correspond.grid_match) — which is what makes
config-scale max_history=80 (config/non_markov_localization.cfg) feasible:
80*N window match matrices would be ~[20k,20k] brute-force.

Covariances: one final evaluation pass over the even tiling extracts every
pose's 3x3 marginal from its window Hessian at the FINAL estimates, rotated
into the pose frame (vector_mapping_main.cpp:2772-2812 semantics). Deviation
(documented): the reference takes each pose's covariance from the last
sliding window that contained it (stale poses); evaluating at the final
estimate is strictly fresher.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...ops.correspond import grid_match
from ...ops.geometry import angle_mod, rotate
from .localizer import EnmlOptions, _odometry_targets, _window_gn

Array = jax.Array

# windows with more points than this use the grid matcher instead of the
# dense [M, M] distance matrix
BRUTE_MATCH_LIMIT = 4096


def _se2_mat(poses: Array) -> Array:
    """[..., 3] (x, y, th) -> [..., 3, 3] homogeneous."""
    c, s = jnp.cos(poses[..., 2]), jnp.sin(poses[..., 2])
    x, y = poses[..., 0], poses[..., 1]
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack([
        jnp.stack([c, -s, x], -1),
        jnp.stack([s, c, y], -1),
        jnp.stack([zero, zero, one], -1),
    ], axis=-2)


def _se2_apply(T: Array, poses: Array) -> Array:
    """Apply carry transform T [3,3] (or [B,1,3,3] batched) to poses
    [..., 3]: p -> R p + t, th -> th + dth."""
    xy = jnp.einsum("...ij,...j->...i",
                    T[..., :2, :2], poses[..., :2]) + T[..., :2, 2]
    dth = jnp.arctan2(T[..., 1, 0], T[..., 0, 0])
    return jnp.concatenate([xy, (poses[..., 2] + dth)[..., None]], axis=-1)


def _gather_windows(arr: Array, starts: Array, W: int, fill_clamp: int):
    """[B] window starts -> [B, W, ...] gathered slices (indices clamped)."""
    idx = starts[:, None] + jnp.arange(W)[None, :]
    return arr[jnp.clip(idx, 0, fill_clamp)], idx


def _grid_capacities(W: int, N: int) -> tuple[int, int]:
    """(bucket, max_cells) for the window grid matcher.

    Sized from measured per-window occupancy (figure8 W=80: <=887 occupied
    cells, max occupancy 107 — bucket 64 density-caps the over-observed
    cells, matching the reference's own max_correspondences_per_point clamp
    in spirit). Violations on denser datasets surface via
    probe_match_capacity, not silently."""
    return 64, max(1024, min(4096, W * N // 16))


def _make_match_fn(flat_pts, flat_nrm, flat_mask, W, N, o: EnmlOptions):
    """Grid-hash window matcher with the same (tgt, valid) contract as the
    brute matcher; used when W*N exceeds BRUTE_MATCH_LIMIT."""
    pose_of = jnp.repeat(jnp.arange(W, dtype=jnp.int32), N)
    bucket, max_cells = _grid_capacities(W, N)

    def match(poses):
        q = poses[pose_of]
        pw = (rotate(q[:, 2], flat_pts) + q[:, :2]).reshape(W, N, 2)
        nw = rotate(q[:, 2], flat_nrm).reshape(W, N, 2)
        import math

        m = grid_match(pw, nw, flat_mask.reshape(W, N),
                       threshold=o.point_match_threshold,
                       min_cos=math.cos(o.max_stf_angle_error),
                       bucket=bucket, max_cells=max_cells)
        return m.target, m.valid

    return match


def window_covariances(H: Array, active: Array, th: Array) -> Array:
    """Per-pose 3x3 marginals from a window Hessian: mask inactive rows,
    regularize, invert, take diagonal blocks, rotate into each pose frame
    (ceres::Covariance DENSE_SVD + frame rotation semantics,
    vector_mapping_main.cpp:2772-2812). f32 on device; the f32-vs-f64
    inversion error is bounded by tests/test_regression.py's measured
    tolerance (DEVIATIONS #8)."""
    W = th.shape[0]
    dtype = H.dtype
    m3 = jnp.repeat(active, 3)
    H = jnp.where(m3[:, None] & m3[None, :], H, 0.0)
    H = H + jnp.diag(jnp.where(m3, 1e-9, 1.0).astype(dtype))
    cov_full = jnp.linalg.inv(H)
    blocks = jax.vmap(
        lambda j: lax.dynamic_slice(cov_full, (3 * j, 3 * j), (3, 3))
    )(jnp.arange(W))
    c, s_ = jnp.cos(-th), jnp.sin(-th)
    zero = jnp.zeros_like(c)
    one_ = jnp.ones_like(c)
    T = jnp.stack([
        jnp.stack([c, -s_, zero], -1),
        jnp.stack([s_, c, zero], -1),
        jnp.stack([zero, zero, one_], -1),
    ], axis=-2)
    return T @ blocks @ jnp.swapaxes(T, -1, -2)


@partial(jax.jit, static_argnames=("options", "W"))
def probe_match_capacity(
    points: Array,         # [P, N, 2] robot frame
    normals: Array,        # [P, N, 2]
    point_mask: Array,     # [P, N]
    poses: Array,          # [P, 3]
    options: EnmlOptions = EnmlOptions(),
    W: int | None = None,
) -> Array:
    """Total grid_match-dropped points over the even window tiling at the
    EXACT capacities checkerboard_localize's matcher uses (ADVICE r2:
    capacity violations on new datasets must be detectable, not silent).

    Returns a scalar int32; 0 means every in-mask point was binned and
    matched exactly within its 3x3 neighborhood on this dataset."""
    import math

    o = options
    P, N, _ = points.shape
    W = min(o.max_history, P) if W is None else W
    bucket, max_cells = _grid_capacities(W, N)
    n_win = -(-P // W)
    starts = W * jnp.arange(n_win)

    def one(start):
        idx = jnp.clip(start + jnp.arange(W), 0, P - 1)
        active = (start + jnp.arange(W)) < P
        q = poses[idx]
        pw = rotate(q[:, 2, None], points[idx]) + q[:, None, :2]
        nw = rotate(q[:, 2, None], normals[idx])
        m = grid_match(pw, nw, point_mask[idx] & active[:, None],
                       threshold=o.point_match_threshold,
                       min_cos=math.cos(o.max_stf_angle_error),
                       bucket=bucket, max_cells=max_cells)
        return m.dropped

    return jnp.sum(jax.lax.map(one, starts))


@partial(jax.jit,
         static_argnames=("options", "n_passes", "chunk", "force_grid",
                          "mesh"))
def checkerboard_localize(
    points: Array,         # [P, N, 2] robot frame
    normals: Array,        # [P, N, 2]
    point_mask: Array,     # [P, N]
    initial_poses: Array,  # [P, 3] odometry-integrated estimates
    options: EnmlOptions = EnmlOptions(),
    n_passes: int = 2,
    chunk: int = 8,        # windows solved per vmap chunk (memory bound)
    force_grid: bool = False,  # use the grid matcher regardless of size
    mesh=None,             # jax.sharding.Mesh: shard the window batch over
                           # its FIRST axis (EnML's data-parallel axis —
                           # windows of one parity are independent)
) -> tuple[Array, Array]:
    """Full-trajectory batched sweep. Returns (poses [P,3], covs [P,3,3])."""
    o = options
    P, N, _ = points.shape
    W = min(o.max_history, P)
    half = max(W // 2, 1)
    dtype = initial_poses.dtype

    axis, d, rot, isig = _odometry_targets(initial_poses, o)

    # pad the pose axis by one dump row so masked scatter writes are clean
    def padp(a, fill=0.0):
        return jnp.concatenate(
            [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)], axis=0)

    use_grid = force_grid or (W * N > BRUTE_MATCH_LIMIT)

    def starts_for(parity):
        # disjoint tiling of [parity*half, P) by stride W; tail windows are
        # partially masked (indices >= P pinned)
        first = parity * half
        n_win = -(-(P - first) // W) if P > first else 0
        return first + W * jnp.arange(max(n_win, 1)), max(n_win, 1)

    def _window_data(start, poses):
        """Gather one window's tensors (shared by matching and GN)."""
        w_poses, idx = _gather_windows(poses, start[None], W, P - 1)
        w_poses, idx = w_poses[0], idx[0]
        active = idx < P
        w_pts = points[jnp.clip(idx, 0, P - 1)]
        w_nrm = normals[jnp.clip(idx, 0, P - 1)]
        w_mask = point_mask[jnp.clip(idx, 0, P - 1)] & active[:, None]
        return w_poses, idx, active, w_pts, w_nrm, w_mask

    def _chain_slices(idx):
        cidx = jnp.clip(idx[:-1], 0, P - 2)
        return (axis[cidx], d[cidx], rot[cidx], isig[cidx],
                (idx[:-1] < P - 1).astype(dtype))

    def solve_one(start, poses, eval_only=False):
        """One window GN solve; returns (new window poses [W,3], H).

        eval_only: no GN iterations — just the window Hessian at `poses`
        (one fresh match + one assembly), for covariance extraction."""
        w_poses, idx, active, w_pts, w_nrm, w_mask = _window_data(start,
                                                                  poses)
        w_axis, w_d, w_rot, w_isig, w_chain_valid = _chain_slices(idx)

        match_fn = None
        if use_grid:
            match_fn = _make_match_fn(
                w_pts.reshape(W * N, 2), w_nrm.reshape(W * N, 2),
                w_mask.reshape(W * N), W, N, o)
        new_poses, H = _window_gn(
            w_poses, w_pts, w_nrm, w_mask, w_axis, w_d, w_rot, w_isig,
            w_chain_valid, o, match_fn=match_fn, w_pin=~active,
            eval_only=eval_only,
            # the solve passes discard H (half_pass ignores it; covariances
            # come from the separate eval_only tiling at FINAL estimates) —
            # skip the final-Hessian system() evaluation there
            need_hessian=eval_only,
        )
        new_poses = jnp.where(active[:, None], new_poses, w_poses)
        return new_poses, H, idx, active

    # ---- split match/GN chunk driver (grid-matcher configs) -------------
    # A vmapped grid match costs ~3.5x its sequential (lax.map) form per
    # window (the batched [ck, cells, bucket, 5*bucket] gated-distance
    # tiles thrash HBM; measured r5: 7.5 vs 2.16 ms/window at W=80,
    # N=256), while the GN steps batch WELL (1.75 ms per 8-window batch).
    # So each match round runs its window matches SEQUENTIALLY via lax.map
    # and feeds the precomputed (tgt, valid) into one BATCHED GN call —
    # the same math _window_gn would do with its own matcher, restructured
    # for the hardware. W=80/1078-node sweep at 1078 nodes: 1642 (r4) ->
    # 1190 -> 981 ms / 132x realtime (BENCH_LOCAL_r5.json).
    o_one_round = dataclasses.replace(o, match_rounds=1)

    def _match_chunk(w_pts, w_nrm, w_mask, w_poses):
        """Sequential per-window grid matches over a chunk."""
        def match_one(args):
            pts_i, nrm_i, mask_i, poses_i = args
            mf = _make_match_fn(pts_i.reshape(W * N, 2),
                                nrm_i.reshape(W * N, 2),
                                mask_i.reshape(W * N), W, N, o)
            return mf(poses_i)

        return lax.map(match_one, (w_pts, w_nrm, w_mask, w_poses))

    def _chunk_data(chunk_starts, poses):
        data = jax.vmap(lambda s: _window_data(s, poses))(chunk_starts)
        chain = jax.vmap(_chain_slices)(data[1])
        return data, chain

    def solve_chunk_split(chunk_starts, poses):
        data, chain = _chunk_data(chunk_starts, poses)
        w_poses0, idx, active, w_pts, w_nrm, w_mask = data

        wp = w_poses0
        for _rnd in range(o.match_rounds):
            tgt, valid = _match_chunk(w_pts, w_nrm, w_mask, wp)

            def gn_one(wposes_i, pts_i, nrm_i, mask_i, ax_i, d_i, rot_i,
                       isig_i, cv_i, act_i, tgt_i, valid_i):
                return _window_gn(
                    wposes_i, pts_i, nrm_i, mask_i, ax_i, d_i, rot_i,
                    isig_i, cv_i, o_one_round,
                    match_fn=lambda _p: (tgt_i, valid_i),
                    w_pin=~act_i, need_hessian=False)[0]

            wp = jax.vmap(gn_one)(wp, w_pts, w_nrm, w_mask, *chain, active,
                                  tgt, valid)
        wp = jnp.where(active[..., None], wp, w_poses0)
        H = jnp.broadcast_to(jnp.eye(3 * W, dtype=dtype),
                             (wp.shape[0], 3 * W, 3 * W))
        return wp, H, idx, active

    def eval_chunk_split(chunk_starts, poses):
        """Split form of the eval_only covariance pass: sequential matches
        at the FINAL poses + one batched Hessian evaluation."""
        data, chain = _chunk_data(chunk_starts, poses)
        w_poses0, idx, active, w_pts, w_nrm, w_mask = data
        tgt, valid = _match_chunk(w_pts, w_nrm, w_mask, w_poses0)

        def eval_one(wposes_i, pts_i, nrm_i, mask_i, ax_i, d_i, rot_i,
                     isig_i, cv_i, act_i, tgt_i, valid_i):
            np_, H = _window_gn(
                wposes_i, pts_i, nrm_i, mask_i, ax_i, d_i, rot_i, isig_i,
                cv_i, o_one_round, match_fn=lambda _p: (tgt_i, valid_i),
                w_pin=~act_i, eval_only=True)
            return np_, H

        np_, H = jax.vmap(eval_one)(w_poses0, w_pts, w_nrm, w_mask, *chain,
                                    active, tgt, valid)
        return np_, H, idx, active

    def solve_parity_chunked(starts, poses):
        B = starts.shape[0]
        if mesh is not None:
            # multi-chip: one vmap over ALL windows, batch axis sharded over
            # the mesh's first axis — GSPMD runs each device's window slice
            # locally (poses/points replicate; they are small).
            # NOTE: this branch keeps the vmapped in-solve matcher rather
            # than the sequential-match split below — a global lax.map
            # would serialize matches ACROSS devices; the per-device split
            # needs a shard_map restructure (future work, see the split
            # driver's comment for the measured single-chip motivation)
            from jax.sharding import NamedSharding, PartitionSpec

            nd = int(mesh.shape[mesh.axis_names[0]])
            Bpad = -(-B // nd) * nd
            starts_p = jnp.concatenate(
                [starts, jnp.full((Bpad - B,), P + W, starts.dtype)])
            starts_p = jax.lax.with_sharding_constraint(
                starts_p, NamedSharding(mesh, PartitionSpec(
                    mesh.axis_names[0])))
            out = jax.vmap(lambda s: solve_one(s, poses))(starts_p)
            new_poses, H, idx, active = out
            return (new_poses[:B], H[:B], idx[:B], active[:B])
        # clamp the vmap width to the real window count: padding windows
        # cost as much as real ones (fully-masked solves), so a 2-window
        # parity under chunk=8 would waste 3/4 of the pass (measured r5:
        # the 129-node W=80 sweep ran as slow as the 1078-node one)
        ck = max(min(chunk, B), 1)
        Bpad = -(-B // ck) * ck
        starts_p = jnp.concatenate(
            [starts, jnp.full((Bpad - B,), P + W, starts.dtype)])

        def run_chunk(chunk_starts):
            if use_grid:
                return solve_chunk_split(chunk_starts, poses)
            return jax.vmap(lambda s: solve_one(s, poses))(chunk_starts)

        out = lax.map(run_chunk, starts_p.reshape(-1, ck))
        new_poses, H, idx, active = jax.tree_util.tree_map(
            lambda a: a.reshape((Bpad,) + a.shape[2:]), out)
        return (new_poses[:B], H[:B], idx[:B], active[:B])

    def half_pass(poses, parity_starts):
        starts = parity_starts
        new_wposes, _H, idx, active = solve_parity_chunked(starts, poses)

        # SE(2) carry: boundary correction at each window's last ACTIVE pose
        last_j = jnp.maximum(jnp.sum(active, axis=1) - 1, 0)       # [B]
        brow = jnp.arange(starts.shape[0])
        old_last = poses[jnp.clip(starts + last_j, 0, P - 1)]      # [B,3]
        new_last = new_wposes[brow, last_j]                        # [B,3]
        dT = _se2_mat(new_last) @ jnp.linalg.inv(_se2_mat(old_last))
        # windows with no active pose contribute identity
        eye = jnp.eye(3, dtype=dtype)
        dT = jnp.where(jnp.any(active, 1)[:, None, None], dT, eye)
        carry_inc = lax.associative_scan(jnp.matmul, dT, axis=0)   # inclusive
        carry = jnp.concatenate([eye[None], carry_inc[:-1]], 0)    # exclusive

        carried = _se2_apply(carry[:, None, :, :], new_wposes)     # [B,W,3]

        # scatter back (disjoint windows; masked rows -> dump row P)
        tgt = jnp.where(active, idx, P).reshape(-1)
        out = padp(poses).at[tgt].set(carried.reshape(-1, 3))[:P]
        # head poses before the first window keep their estimate (parity 1);
        # nothing else is outside the tiling
        return out

    starts0_np, _ = starts_for(0)
    starts1_np, _ = starts_for(1)

    poses = initial_poses
    for _ in range(n_passes):
        poses = half_pass(poses, starts0_np)
        if P > half:
            poses = half_pass(poses, starts1_np)

    # ---- covariance extraction: evaluate each window's Hessian AT the
    # final estimates (eval_only: one match + one assembly, no GN
    # iterations). A window's FIRST pose is PINNED (identity block), so its
    # inverse block is a bogus ~I marginal — the even tiling therefore
    # cannot provide the marginals of poses 0, W, 2W, ...; a second eval
    # pass over the ODD tiling (where those poses sit at interior offset
    # ceil(W/2)) overwrites exactly those rows (review finding r3) ----
    def eval_tiling(starts_np):
        B = starts_np.shape[0]
        ck = max(min(chunk, B), 1)
        Bpad = -(-B // ck) * ck
        starts_p = jnp.concatenate(
            [starts_np, jnp.full((Bpad - B,), P + W, starts_np.dtype)])

        def run_chunk(chunk_starts):
            def finish(_np_, H, idx, active):
                covs = window_covariances(H, active, _np_[:, 2])
                # the pinned window-first pose's block is NOT a marginal
                pinned = jnp.arange(W) == 0
                return covs, idx, active & ~pinned

            if use_grid:
                np_, H, idx, active = eval_chunk_split(chunk_starts, poses)
                return jax.vmap(finish)(np_, H, idx, active)

            def one(s):
                return finish(*solve_one(s, poses, eval_only=True))

            return jax.vmap(one)(chunk_starts)

        covs, idxs, actives = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]),
            lax.map(run_chunk, starts_p.reshape(-1, ck)))   # [Bpad, W, ..]
        # padding windows carry active=False throughout, so their rows land
        # in the dump slot below — no explicit trimming needed
        return (covs.reshape(-1, 3, 3), idxs.reshape(-1),
                actives.reshape(-1))

    covs, idxs, actives = eval_tiling(starts0_np)
    tgt = jnp.where(actives, idxs, P)
    covariances = jnp.zeros((P + 1, 3, 3), dtype).at[tgt].set(covs)[:P]
    if P > half:
        covs1, idxs1, actives1 = eval_tiling(starts1_np)
        # only the even tiling's pinned poses (multiples of W) need the odd
        # pass; everything else keeps the even-tiling marginal
        fill = actives1 & (idxs1 % W == 0)
        tgt1 = jnp.where(fill, idxs1, P)
        covariances = jnp.concatenate(
            [covariances, jnp.zeros((1, 3, 3), dtype)],
            0).at[tgt1].set(covs1)[:P]
    covariances = covariances.at[0].set(jnp.eye(3, dtype=dtype) * 1e-6)

    poses = poses.at[:, 2].set(angle_mod(poses[:, 2]))
    return poses, covariances
