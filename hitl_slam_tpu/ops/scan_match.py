"""Correlative scan matching on the MXU.

The north-star design calls for correlative scan matching as a TPU
correlation kernel (BASELINE.json). The reference has no shipped equivalent
(EnML's dormant episode-initialization relied on KD-tree ICP); this module
provides the capability natively:

Olson-style correlative matching: the map becomes a Gaussian-likelihood
raster; the query scan becomes a sparse point raster per candidate rotation;
the score of every candidate translation is then EXACTLY a 2D
cross-correlation — one `lax.conv` per rotation batch, which XLA lowers onto
the systolic array. The full (theta, dx, dy) search volume is scored in a
handful of convolutions and reduced with a single argmax.

Uses: global relocalization, EnML episode seeding, loop-closure proposals.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@dataclass(frozen=True)
class ScanMatchParams:
    resolution: float = 0.05      # m / cell
    window: float = 1.0           # +- translation search (m)
    angle_window: float = 0.35    # +- rotation search (rad)
    num_angles: int = 29          # rotation candidates
    sigma: float = 0.1            # map likelihood smoothing (m)
    map_extent: float = 14.0      # half-extent of the local map raster (m)


def _gaussian_kernel(sigma_cells: float, dtype) -> Array:
    r = max(1, int(3 * sigma_cells))
    x = jnp.arange(-r, r + 1, dtype=dtype)
    g = jnp.exp(-0.5 * (x / sigma_cells) ** 2)
    return g / jnp.sum(g)


@partial(jax.jit, static_argnames=("params",))
def build_likelihood_field(
    map_pts: Array,     # [M, 2] world-frame map points
    map_mask: Array,    # [M]
    center: Array,      # [2] raster center (world)
    params: ScanMatchParams = ScanMatchParams(),
) -> Array:
    """[H, H] Gaussian-blurred occupancy raster around `center`."""
    p = params
    H = int(2 * p.map_extent / p.resolution)
    ij = ((map_pts - (center - p.map_extent)) / p.resolution).astype(jnp.int32)
    ok = (map_mask & (ij[:, 0] >= 0) & (ij[:, 0] < H)
          & (ij[:, 1] >= 0) & (ij[:, 1] < H))
    ij = jnp.where(ok[:, None], ij, 0)
    grid = jnp.zeros((H, H), map_pts.dtype)
    grid = grid.at[ij[:, 1], ij[:, 0]].max(jnp.where(ok, 1.0, 0.0))
    # separable Gaussian blur via two 1-D convolutions
    g = _gaussian_kernel(p.sigma / p.resolution, map_pts.dtype)
    k = g.shape[0]
    grid4 = grid[None, None]
    gx = g[None, None, None, :]
    gy = g[None, None, :, None]
    blurred = lax.conv_general_dilated(grid4, gx, (1, 1),
                                       [(0, 0), (k // 2, k // 2)])
    blurred = lax.conv_general_dilated(blurred, gy, (1, 1),
                                       [(k // 2, k // 2), (0, 0)])
    out = blurred[0, 0]
    return out / jnp.maximum(jnp.max(out), 1e-9)


@partial(jax.jit, static_argnames=("params",))
def correlative_match(
    field: Array,       # [H, H] likelihood raster (build_likelihood_field)
    center: Array,      # [2] its world center
    scan_pts: Array,    # [N, 2] robot-frame query scan
    scan_mask: Array,   # [N]
    pose_guess: Array,  # [3] initial (x, y, theta)
    params: ScanMatchParams = ScanMatchParams(),
) -> tuple[Array, Array, Array]:
    """-> (pose [3], score, ambiguity): the (theta, dx, dy) in the search
    window around `pose_guess` maximizing scan/map correlation. `ambiguity`
    is the ratio of the best score OUTSIDE a 0.3 m translation ball around
    the winner to the winning score (1.0 = a second equally-good alignment
    exists, e.g. a wrong-but-parallel wall; near 0 = unambiguous)."""
    p = params
    H = field.shape[0]
    W = (int(2 * p.window / p.resolution) | 1)   # odd translation window
    # Olson's construction: the kernel is the FULL-extent scan raster; the
    # valid cross-correlation output then scores exactly the W x W candidate
    # translations centered on the field center. Requires K = H - W + 1.
    K = H - W + 1
    assert K >= 3, "translation window larger than the map raster"
    T = p.num_angles
    dtype = field.dtype

    angles = pose_guess[2] + jnp.linspace(-p.angle_window, p.angle_window, T)
    c, s = jnp.cos(angles), jnp.sin(angles)     # [T]
    # scan offsets from the robot for each candidate rotation [T, N, 2]
    x, y = scan_pts[:, 0], scan_pts[:, 1]
    rx = c[:, None] * x[None] - s[:, None] * y[None]
    ry = s[:, None] * x[None] + c[:, None] * y[None]

    # rasterize into [T, K, K] kernels centered on the robot
    kc = (K - 1) / 2.0
    ki = jnp.floor(rx / p.resolution + kc).astype(jnp.int32)
    kj = jnp.floor(ry / p.resolution + kc).astype(jnp.int32)
    ok = (scan_mask[None] & (ki >= 0) & (ki < K) & (kj >= 0) & (kj < K))
    ki = jnp.where(ok, ki, 0)
    kj = jnp.where(ok, kj, 0)
    t_idx = jnp.broadcast_to(jnp.arange(T)[:, None], ok.shape)
    kern = jnp.zeros((T, K, K), dtype)
    kern = kern.at[t_idx, kj, ki].max(jnp.where(ok, 1.0, 0.0))

    # correlation on the MXU: input [1,1,H,H] x kernels [T,1,K,K] -> [T,W,W]
    scores = lax.conv_general_dilated(
        field[None, None], kern[:, None], (1, 1), "VALID",
    )[0]

    flat = scores.reshape(-1)
    best = jnp.argmax(flat)
    bt = best // (W * W)
    brc = best % (W * W)
    br = brc // W
    bc = brc % W
    # output (br, bc) places the robot at field cell (br + kc, bc + kc);
    # cell (H-1)/2 is the field center's world position
    half_field = (H - 1) / 2.0
    bx = center[0] + (bc.astype(dtype) + kc - half_field) * p.resolution
    by = center[1] + (br.astype(dtype) + kc - half_field) * p.resolution
    pose = jnp.stack([bx, by, angles[bt]])
    n_valid = jnp.maximum(jnp.sum(scan_mask.astype(dtype)), 1.0)

    # second peak outside a 0.3 m translation ball around the winner (over
    # all rotations): detects aliasing onto parallel structure
    r_sup = 0.3 / p.resolution
    rr = jnp.arange(W, dtype=dtype)
    far = ((rr[:, None] - br.astype(dtype)) ** 2
           + (rr[None, :] - bc.astype(dtype)) ** 2) > r_sup * r_sup
    second = jnp.max(jnp.where(far[None], scores, -jnp.inf))
    ambiguity = second / jnp.maximum(flat[best], 1e-9)
    return pose, flat[best] / n_valid, ambiguity
