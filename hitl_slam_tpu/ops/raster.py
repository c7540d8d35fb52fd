"""Headless map rasterization on device.

Replaces the reference's Qt/OpenGL render path (vector_display.cpp) for
headless use: points and polylines are scattered into an RGB framebuffer as
one fused XLA program (coordinate transform -> pixel indices -> scatter-max),
so "re-render" in the benchmark's correspondence+solve+re-render loop stays
on device. Also the factor-adjacency ("information matrix") image the
reference writes after every solve (JointOptimization.cpp:1313-1382,
info_mat.png).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _unpack_color(col: int) -> tuple[int, int, int]:
    return ((col >> 16) & 0xFF, (col >> 8) & 0xFF, col & 0xFF)


@partial(jax.jit, static_argnames=("height", "width"))
def rasterize_points(
    pts: Array,          # [N, 2] world coords
    mask: Array,         # [N] bool
    colors: Array,       # [N, 3] uint8
    origin: Array,       # [2] world coords of pixel (0, 0)
    scale: Array,        # pixels per meter
    height: int = 1024,
    width: int = 1024,
) -> Array:
    """Scatter masked points into an RGB image [H, W, 3] (uint8).

    y axis points up (world) -> row 0 is the top of the image.
    """
    px = ((pts[:, 0] - origin[0]) * scale).astype(jnp.int32)
    py = (height - 1 - (pts[:, 1] - origin[1]) * scale).astype(jnp.int32)
    ok = mask & (px >= 0) & (px < width) & (py >= 0) & (py < height)
    px = jnp.where(ok, px, 0)
    py = jnp.where(ok, py, 0)
    col = jnp.where(ok[:, None], colors.astype(jnp.uint8), 0)
    img = jnp.zeros((height, width, 3), jnp.uint8)
    return img.at[py, px].max(col)


@partial(jax.jit, static_argnames=("height", "width", "samples"))
def rasterize_lines(
    p1: Array,           # [L, 2]
    p2: Array,           # [L, 2]
    mask: Array,         # [L]
    colors: Array,       # [L, 3] uint8
    origin: Array,
    scale: Array,
    height: int = 1024,
    width: int = 1024,
    samples: int = 256,
) -> Array:
    """Sample each segment at `samples` points and scatter (static shapes)."""
    t = jnp.linspace(0.0, 1.0, samples)[None, :, None]
    pts = p1[:, None, :] + t * (p2 - p1)[:, None, :]        # [L, S, 2]
    pts = pts.reshape(-1, 2)
    m = jnp.broadcast_to(mask[:, None], (mask.shape[0], samples)).reshape(-1)
    c = jnp.broadcast_to(colors[:, None, :],
                         (colors.shape[0], samples, 3)).reshape(-1, 3)
    return rasterize_points(pts, m, c, origin, scale, height, width)


@jax.jit
def compose(*layers: Array) -> Array:
    """Pixelwise max-composite of RGB layers."""
    out = layers[0]
    for layer in layers[1:]:
        out = jnp.maximum(out, layer)
    return out


def render_map(
    world_points: Array,   # [P, N, 2]
    point_mask: Array,     # [P, N]
    poses: Array,          # [P, 3]
    height: int = 1024,
    width: int = 1024,
    margin: float = 1.0,
    point_color: int = 0xDE2352,
    trajectory_color: int = 0x6B6B6B,
) -> Array:
    """Full map render: scans + trajectory polyline. Returns [H, W, 3] u8.

    The fit (origin/scale) is computed on device from the data bounds.
    """
    flat = world_points.reshape(-1, 2)
    fmask = point_mask.reshape(-1)
    big = jnp.where(fmask[:, None], flat, -jnp.inf)
    small = jnp.where(fmask[:, None], flat, jnp.inf)
    lo = jnp.minimum(jnp.min(small, axis=0), jnp.min(poses[:, :2], axis=0))
    hi = jnp.maximum(jnp.max(big, axis=0), jnp.max(poses[:, :2], axis=0))
    lo = lo - margin
    hi = hi + margin
    scale = jnp.min(
        jnp.array([width, height], jnp.float32) / jnp.maximum(hi - lo, 1e-6)
    )

    pc = jnp.tile(jnp.asarray(_unpack_color(point_color), jnp.uint8),
                  (flat.shape[0], 1))
    img_pts = rasterize_points(flat, fmask, pc, lo, scale, height, width)

    p1 = poses[:-1, :2]
    p2 = poses[1:, :2]
    lmask = jnp.ones(p1.shape[0], bool)
    lc = jnp.tile(jnp.asarray(_unpack_color(trajectory_color), jnp.uint8),
                  (p1.shape[0], 1))
    img_traj = rasterize_lines(p1, p2, lmask, lc, lo, scale, height, width,
                               samples=64)
    return compose(img_pts, img_traj)


@jax.jit
def info_matrix_image(num_poses_arr: Array, anchor: Array, constrained: Array,
                      active: Array) -> Array:
    """[P, P] uint8 factor-adjacency image: 255 where poses share a factor
    (odometry band + human constraint pairs), as JointOptimization.cpp
    renders to info_mat.png."""
    P = num_poses_arr.shape[0]
    img = jnp.zeros((P, P), jnp.uint8)
    i = jnp.arange(P - 1)
    img = img.at[i, i + 1].set(255).at[i + 1, i].set(255)
    a = jnp.where(active, anchor, 0)
    c = jnp.where(active, constrained, 0)
    v = jnp.where(active, 255, 0).astype(jnp.uint8)
    img = img.at[a, c].max(v).at[c, a].max(v)
    return img
