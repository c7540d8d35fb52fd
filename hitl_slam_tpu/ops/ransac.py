"""Batched sequential RANSAC line-segment extraction.

Replaces the reference's LocalSequentialRANSAC (RANSAC.{h,cpp}: greedy
sequential inlier walks with a 2-endpoint Ceres segment refit per candidate).
TPU shape: each round scores K random pair-hypotheses against ALL points at
once ([K, M] distance matrix on the VPU), takes the best line, refines it by
total least squares over its inliers, claims them, and repeats for a fixed
number of segments (`lax.scan`). Static shapes throughout; segments below the
inlier floor come back invalid.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@dataclass(frozen=True)
class RansacParams:
    num_segments: int = 32        # max segments extracted
    num_hypotheses: int = 256     # pair hypotheses scored per round
    inlier_threshold: float = 0.06
    min_inliers: int = 12
    min_length: float = 0.3


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Segments:
    p1: Array        # [S, 2]
    p2: Array        # [S, 2]
    count: Array     # [S] inlier counts
    valid: Array     # [S] bool
    mass: Array      # [S] f32 (== count; the curator's 'mass')
    centroid: Array  # [S, 2]
    scatter: Array   # [S, 2, 2] inlier scatter matrix about the centroid


@partial(jax.jit, static_argnames=("params",))
def extract_segments(
    pts: Array,     # [M, 2] (filtered world points)
    mask: Array,    # [M]
    key: Array,     # jax.random key
    params: RansacParams = RansacParams(),
) -> Segments:
    p = params
    M = pts.shape[0]

    def line_from_pair(a: Array, b: Array):
        d = b - a
        n = jnp.stack([-d[1], d[0]])
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-9)
        return n, jnp.dot(n, a)   # n . x = c

    def round_step(carry, key_r):
        avail, _ = carry
        k1, k2 = jax.random.split(key_r)
        # sample hypothesis endpoints from AVAILABLE points: late rounds
        # hold only a small unclaimed cluster, and uniform sampling over M
        # rarely draws an available PAIR there — the round would die at the
        # ok_h gate and real short walls would never be extracted
        p_av = avail.astype(pts.dtype)
        p_av = p_av / jnp.maximum(jnp.sum(p_av), 1.0)
        ia = jax.random.choice(k1, M, (p.num_hypotheses,), p=p_av)
        ib = jax.random.choice(k2, M, (p.num_hypotheses,), p=p_av)
        a = pts[ia]
        b = pts[ib]
        d = b - a
        nrm = jnp.stack([-d[:, 1], d[:, 0]], -1)
        nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        n = nrm / jnp.maximum(nlen, 1e-9)
        c = jnp.sum(n * a, -1)
        ok_h = (avail[ia] & avail[ib]
                & (nlen[:, 0] > 1e-6))
        # [K, M] point-line distances
        dist = jnp.abs(pts @ n.T - c[None, :]).T
        inl = (dist < p.inlier_threshold) & avail[None, :]
        counts = jnp.sum(inl, axis=1) * ok_h
        best = jnp.argmax(counts)
        # all-zero scores mean argmax picked an arbitrary (possibly
        # degenerate) hypothesis: a duplicate-point pair has n_b = 0 and
        # would claim EVERY available point as an inlier — gate the round
        best_ok = counts[best] > 0

        n_b, c_b = n[best], c[best]
        inliers = ((jnp.abs(pts @ n_b - c_b) < p.inlier_threshold) & avail
                   & best_ok)

        # total-least-squares refine over the claimed inliers
        wsum = jnp.maximum(jnp.sum(inliers), 1)
        cm = jnp.sum(jnp.where(inliers[:, None], pts, 0.0), 0) / wsum
        rel = jnp.where(inliers[:, None], pts - cm, 0.0)
        S = rel.T @ rel
        _, evecs = jnp.linalg.eigh(S)
        direction = evecs[:, 1]     # largest eigenvalue -> line direction
        # re-gate inliers against the refined line
        n_ref = jnp.stack([-direction[1], direction[0]])
        d_ref = jnp.abs((pts - cm) @ n_ref)
        inliers = (d_ref < p.inlier_threshold) & avail & best_ok
        wsum = jnp.maximum(jnp.sum(inliers), 1)
        cm = jnp.sum(jnp.where(inliers[:, None], pts, 0.0), 0) / wsum
        rel = jnp.where(inliers[:, None], pts - cm, 0.0)
        S = rel.T @ rel
        t = rel @ direction
        count = jnp.sum(inliers)
        t_lo = jnp.where(count > 0,
                         jnp.min(jnp.where(inliers, t, jnp.inf)), 0.0)
        t_hi = jnp.where(count > 0,
                         jnp.max(jnp.where(inliers, t, -jnp.inf)), 0.0)
        p1 = cm + t_lo * direction
        p2 = cm + t_hi * direction
        length = t_hi - t_lo
        valid = ((count >= p.min_inliers) & (length >= p.min_length)
                 & best_ok)

        avail = avail & ~(inliers & valid)
        seg = (p1, p2, count.astype(jnp.int32), valid,
               count.astype(pts.dtype), cm, S)
        return (avail, valid), seg

    keys = jax.random.split(key, p.num_segments)
    (_, _), segs = lax.scan(round_step, (mask, jnp.asarray(True)), keys)
    p1, p2, count, valid, mass, cm, S = segs
    return Segments(p1=p1, p2=p2, count=count, valid=valid, mass=mass,
                    centroid=cm, scatter=S)
