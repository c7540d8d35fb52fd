"""Long-term-feature (LTF) factors: scan-to-vector-map localization.

The reference's EnML loads a vector map (`vector_map_.loadMap`,
vector_mapping.cpp:2682) and classifies observations as long-term features —
points explained by the known map — constrained with point-to-line factors
(the PointToLineConstraint family, residual_functors.h:314-385,480-622). Its
shipped BatchLocalize path never adds them; here the capability is live and
batched:

  - `match_segments`: for every robot-frame point (under a candidate pose),
    the nearest map segment within a threshold — one [N, S] distance matrix
    on the VPU (maps have O(100) segments; no spatial index needed).
  - `ltf_residuals` / GN localization: point-to-line distances along segment
    normals, σ-scaled like the reference's kLaserStdDev / correlation factor,
    minimized over the single pose with a tiny 3x3 Gauss-Newton — batched
    over poses with vmap.

Together with models/ltvm (which builds the vector maps) this closes the
reference's curate -> localize loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import perp, rotate

Array = jax.Array

LTF_STD_DEV = 0.05                 # kLaserStdDev
LTF_CORRELATION = 1.0 / 40.0       # point_correlation_factor


def point_segment_geometry(segs: Array, pts: Array):
    """segs [S, 4], pts [N, 2] -> (dist [N, S], normal [S, 2], t [N, S])."""
    a = segs[:, 0:2]
    d = segs[:, 2:4] - a
    denom = jnp.maximum(jnp.sum(d * d, -1), 1e-12)
    t = ((pts[:, None, :] - a[None]) * d[None]).sum(-1) / denom[None]
    tc = jnp.clip(t, 0.0, 1.0)
    proj = a[None] + tc[..., None] * d[None]
    dist = jnp.linalg.norm(pts[:, None, :] - proj, axis=-1)
    n = perp(d / jnp.sqrt(denom)[:, None])
    return dist, n, t


@partial(jax.jit, static_argnames=())
def match_segments(
    segs: Array,        # [S, 4] world-frame vector map
    world_pts: Array,   # [N, 2]
    mask: Array,        # [N]
    threshold: float = 0.25,
) -> tuple[Array, Array]:
    """Nearest map segment per point -> (seg_idx [N], valid [N])."""
    dist, _, t = point_segment_geometry(segs, world_pts)
    # only interior projections count as line evidence (the reference's
    # point-to-LINE factor has no endpoint pull)
    interior = (t >= 0.0) & (t <= 1.0)
    dist = jnp.where(interior, dist, jnp.inf)
    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best = jnp.min(dist, axis=1)
    return idx, mask & (best < threshold)


def _ltf_system(segs, pts, pose, seg_idx, valid, w):
    """GN normal equations for one pose's point-to-line factors."""
    world = rotate(pose[2], pts) + pose[:2]
    a = segs[seg_idx, 0:2]
    d = segs[seg_idx, 2:4] - a
    n = perp(d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12))
    r = jnp.sum(n * (world - a), -1) * w          # signed line distance
    r = jnp.where(valid, r, 0.0)
    # d world / d pose = [I | perp(R p)]
    dth = perp(rotate(pose[2], pts))
    J = jnp.concatenate([n, jnp.sum(n * dth, -1)[:, None]], -1) * w
    J = jnp.where(valid[:, None], J, 0.0)
    H = J.T @ J
    g = J.T @ r
    cost = 0.5 * jnp.sum(r * r)
    return H, g, cost


@partial(jax.jit, static_argnames=("iterations", "rematch_every"))
def localize_against_map(
    segs: Array,        # [S, 4] vector map (world frame)
    pts: Array,         # [N, 2] robot-frame scan
    mask: Array,        # [N]
    pose0: Array,       # [3] initial pose
    iterations: int = 10,
    rematch_every: int = 3,
    threshold: float = 0.25,
    damping: float = 1e-3,
) -> tuple[Array, Array, Array]:
    """Refine one pose against the vector map. Returns (pose, cost,
    num_inliers). vmap over leading axes for batched localization."""
    w = jnp.asarray(LTF_CORRELATION / LTF_STD_DEV, pts.dtype)

    pose = pose0
    seg_idx = jnp.zeros(pts.shape[0], jnp.int32)
    valid = jnp.zeros(pts.shape[0], bool)
    cost = jnp.zeros((), pts.dtype)
    for it in range(iterations):
        if it % rematch_every == 0:
            world = rotate(pose[2], pts) + pose[:2]
            seg_idx, valid = match_segments(segs, world, mask, threshold)
        H, g, cost = _ltf_system(segs, pts, pose, seg_idx, valid, w)
        Hd = H + damping * jnp.eye(3, dtype=pts.dtype) * jnp.maximum(
            jnp.trace(H), 1.0)
        step = jnp.linalg.solve(Hd, -g)
        pose = pose + step
    return pose, cost, jnp.sum(valid)
