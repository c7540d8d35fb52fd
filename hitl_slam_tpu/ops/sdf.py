"""Truncated signed-distance-field builder, TPU style.

The reference's SignedDistanceFunction::init (SDF.cpp:21-146) is a quadruple
loop — every pixel against every ray of every scan — with per-ray angular
gating; it is the main reason LTVM was left unbuilt. The TPU redesign is a
projective TSDF: scans are binned by bearing once, and each pixel gathers the
interpolated beam range at its own bearing — one O(HW) fused pass per scan,
`lax.scan`-ed over poses. Weight/value semantics follow the reference
(SDF.h:38-67): truncation to [min_sdf_value, max_sdf_value], exponential
bearing-distance weight exp(-sigma (d - eps)^2) with max weight inside eps,
running weighted mean, and the T_dynamic * max-weight binarized mask used to
filter dynamic objects.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@dataclass(frozen=True)
class SdfParams:
    """Names/values from SDF.h:38-67."""

    image_resolution: float = 0.04   # m / pixel (ref default 0.02)
    min_sdf_weight: float = 0.01
    max_sdf_weight: float = 1.0
    min_sdf_value: float = -0.2
    max_sdf_value: float = 0.2
    image_border: float = 0.3
    eps: float = 0.02
    sigma: float = 0.02
    t_dynamic: float = 0.2
    num_bearing_bins: int = 1024
    max_range: float = 12.0


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SdfImage:
    values: Array    # [H, W] f32
    weights: Array   # [H, W] f32
    origin: Array    # [2] world coords of pixel (0, 0) (col, row=y-up grid)
    resolution: Array  # scalar


def _bin_scan(pose: Array, pts: Array, mask: Array, nbins: int,
              max_range: float):
    """Per-bearing-bin min range for one robot-frame scan."""
    r = jnp.linalg.norm(pts, axis=-1)
    bearing = jnp.arctan2(pts[:, 1], pts[:, 0])
    b = ((bearing + jnp.pi) / (2 * jnp.pi) * nbins).astype(jnp.int32) % nbins
    valid = mask & (r > 1e-3) & (r < max_range)
    ranges = jnp.full((nbins,), jnp.inf, pts.dtype)
    ranges = ranges.at[jnp.where(valid, b, 0)].min(
        jnp.where(valid, r, jnp.inf))
    return ranges


@partial(jax.jit, static_argnames=("height", "width", "params"))
def build_sdf(
    poses: Array,        # [P, 3]
    points: Array,       # [P, N, 2] robot frame
    point_mask: Array,   # [P, N]
    origin: Array,       # [2] world coords of pixel (0,0)
    height: int,
    width: int,
    params: SdfParams = SdfParams(),
) -> SdfImage:
    p = params
    res = p.image_resolution
    gx = origin[0] + res * jnp.arange(width)
    gy = origin[1] + res * jnp.arange(height)
    pix = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)   # [H, W, 2]

    def step(carry, inp):
        values, weights = carry
        pose, pts, mask = inp
        ranges = _bin_scan(pose, pts, mask, p.num_bearing_bins, p.max_range)

        delta = pix - pose[:2]
        r_pix = jnp.linalg.norm(delta, axis=-1)
        bearing = jnp.arctan2(delta[..., 1], delta[..., 0]) - pose[2]
        bearing = jnp.arctan2(jnp.sin(bearing), jnp.cos(bearing))
        fb = (bearing + jnp.pi) / (2 * jnp.pi) * p.num_bearing_bins
        b0 = jnp.floor(fb).astype(jnp.int32) % p.num_bearing_bins
        b1 = (b0 + 1) % p.num_bearing_bins
        r0 = ranges[b0]
        r1 = ranges[b1]
        both = jnp.isfinite(r0) & jnp.isfinite(r1)
        frac = fb - jnp.floor(fb)
        beam = jnp.where(both, (1 - frac) * r0 + frac * r1,
                         jnp.minimum(r0, r1))   # one-sided fallback

        sdf = beam - r_pix                       # + free space, - behind
        tsdf = jnp.minimum(sdf, p.max_sdf_value)
        w = jnp.where(
            jnp.abs(tsdf) <= p.eps,
            p.max_sdf_weight,
            jnp.exp(-p.sigma * (tsdf - p.eps) ** 2),
        )
        update = (
            jnp.isfinite(beam)
            & (sdf >= p.min_sdf_value)
            & (r_pix < p.max_range)
        )
        w = jnp.where(update, w, 0.0)
        values = (values * weights + w * jnp.where(update, tsdf, 0.0)) / (
            jnp.maximum(weights + w, 1e-12))
        weights = weights + w
        return (values, weights), None

    v0 = jnp.zeros((height, width), poses.dtype)
    w0 = jnp.zeros((height, width), poses.dtype)
    (values, weights), _ = lax.scan(step, (v0, w0), (poses, points, point_mask))
    # never-observed pixels read min_sdf_value ('behind surface', the
    # reference's init), not the accumulator's 0/eps = 0 'at surface'
    # (review finding r3: the old v0 init was destroyed by the first
    # zero-weight update)
    values = jnp.where(weights > 0, values, p.min_sdf_value)
    return SdfImage(values=values, weights=weights, origin=origin,
                    resolution=jnp.asarray(res, poses.dtype))


@partial(jax.jit, static_argnames=("params",))
def dynamic_mask(sdf: SdfImage, params: SdfParams = SdfParams()) -> Array:
    """[H, W] bool: static-world pixels (weights above T_dynamic * max),
    the reference's weight binarization (SDF.cpp:131-146)."""
    return sdf.weights > params.t_dynamic * jnp.max(sdf.weights)


@partial(jax.jit, static_argnames=("params",))
def filter_points(
    sdf: SdfImage,
    world_pts: Array,     # [..., 2]
    mask: Array,          # [...]
    params: SdfParams = SdfParams(),
) -> Array:
    """Keep points that fall on static, near-surface pixels of the SDF —
    the curator's dynamic-object filter. Returns the refined mask."""
    ok_static = dynamic_mask(sdf, params)
    col = ((world_pts[..., 0] - sdf.origin[0]) / sdf.resolution).astype(jnp.int32)
    row = ((world_pts[..., 1] - sdf.origin[1]) / sdf.resolution).astype(jnp.int32)
    H, W = sdf.values.shape
    inb = (col >= 0) & (col < W) & (row >= 0) & (row < H)
    colc = jnp.clip(col, 0, W - 1)
    rowc = jnp.clip(row, 0, H - 1)
    near_surface = jnp.abs(sdf.values[rowc, colc]) < params.eps * 4
    return mask & inb & ok_static[rowc, colc] & near_surface


def sdf_bounds(world_pts, mask, border: float):
    """Host helper: (origin, height, width) covering the masked points."""
    import numpy as np

    pts = np.asarray(world_pts).reshape(-1, 2)
    m = np.asarray(mask).reshape(-1)
    lo = pts[m].min(axis=0) - border
    hi = pts[m].max(axis=0) + border
    return lo.astype(np.float32), hi.astype(np.float32)
