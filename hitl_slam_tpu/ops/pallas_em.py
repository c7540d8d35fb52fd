"""Pallas TPU kernel for the EM selection sweep.

One VMEM-streaming pass over the padded point cloud computing everything the
EM/verification stages need from the map at once:

  - per-pose inlier counts against both refit segments
    (EstablishObservationSets, EMinput.cpp:281-323)
  - global minimum squared distance from each of the 4 clicked points to any
    map point (verifyUserInput, HitLSLAM.cpp:218-243)

The XLA path materializes a [4, P, N] distance tensor for verification plus
two [P, N] segment-distance arrays; the kernel keeps everything in VMEM and
writes only [P, 2] counts + [4, 1] minima. Coordinates are fed as separate
x/y planes so the lane dimension is the (128-aligned) point axis. Grid over
pose tiles. Falls back to interpret mode off-TPU so CPU tests exercise the
same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

POSE_TILE = 8  # poses per grid step (f32 sublane height)


def _kernel(x_ref, y_ref, mask_ref, sel_ref, counts_ref, mind_ref, *, t2):
    step = pl.program_id(0)
    x = x_ref[:]                          # [T, N]
    y = y_ref[:]
    m = mask_ref[:] != 0
    sel = sel_ref[:]                      # [4, 2]

    def seg_dist2(x1, y1, x2, y2):
        dx = x2 - x1
        dy = y2 - y1
        denom = jnp.maximum(dx * dx + dy * dy, 1e-20)
        t = ((x - x1) * dx + (y - y1) * dy) / denom
        t = jnp.clip(t, 0.0, 1.0)
        px = x1 + t * dx
        py = y1 + t * dy
        return (x - px) ** 2 + (y - py) ** 2

    d2a = seg_dist2(sel[0, 0], sel[0, 1], sel[1, 0], sel[1, 1])
    d2b = seg_dist2(sel[2, 0], sel[2, 1], sel[3, 0], sel[3, 1])
    fm = m.astype(x.dtype)
    ca = jnp.sum(jnp.where(d2a < t2, fm, 0.0), axis=1)
    cb = jnp.sum(jnp.where(d2b < t2, fm, 0.0), axis=1)
    counts_ref[:] = jnp.stack([ca, cb], axis=1)

    big = jnp.asarray(1e30, x.dtype)
    mins = []
    for k in range(4):
        d2 = (x - sel[k, 0]) ** 2 + (y - sel[k, 1]) ** 2
        d2 = jnp.where(m, d2, big)
        mins.append(jnp.min(d2))
    tile_min = jnp.stack(mins).reshape(4, 1)

    @pl.when(step == 0)
    def _():
        mind_ref[:] = tile_min

    @pl.when(step != 0)
    def _():
        mind_ref[:] = jnp.minimum(mind_ref[:], tile_min)


@functools.partial(jax.jit, static_argnames=("inlier_threshold",))
def em_scan(
    world: Array,       # [P, N, 2]
    mask: Array,        # [P, N]
    sel: Array,         # [4, 2]
    inlier_threshold: float = 0.03,
) -> tuple[Array, Array]:
    """-> (counts [P, 2] int32, min_dist2 [4]). P padded to POSE_TILE."""
    P, N, _ = world.shape
    Ppad = -(-P // POSE_TILE) * POSE_TILE
    x = world[..., 0]
    y = world[..., 1]
    mask_i = mask.astype(jnp.int32)
    if Ppad != P:
        zf = jnp.zeros((Ppad - P, N), world.dtype)
        x = jnp.concatenate([x, zf], 0)
        y = jnp.concatenate([y, zf], 0)
        mask_i = jnp.concatenate(
            [mask_i, jnp.zeros((Ppad - P, N), jnp.int32)], 0)

    grid = (Ppad // POSE_TILE,)
    kernel = functools.partial(_kernel, t2=inlier_threshold**2)
    counts, mind = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((POSE_TILE, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((POSE_TILE, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((POSE_TILE, N), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((POSE_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Ppad, 2), world.dtype),
            jax.ShapeDtypeStruct((4, 1), world.dtype),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, y, mask_i, sel)
    return counts[:P].astype(jnp.int32), mind[:, 0]
