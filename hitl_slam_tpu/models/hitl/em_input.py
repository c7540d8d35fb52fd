"""EM interpretation of the human's sketched corrections.

TPU redesign of the reference's EMInput stage (EMinput.cpp):

  - `verify_input`       0.05 m proximity check of every clicked point against
                         the world-frame map (HitLSLAM.cpp:218-243) — one
                         masked distance reduction instead of a triple loop.
  - `endpoint_adjust`    AutomaticEndpointAdjustment (EMinput.cpp:199-248):
                         the repeat-until-stable loop over {gather inliers
                         within 0.03 m, 1-parameter orientation re-fit about
                         the fixed midpoint}. The Ceres DENSE_QR fit
                         (SegFitEM, :152-191) becomes 25 Gauss-Newton steps on
                         the exact clamped point-to-segment objective with a
                         closed-form dtheta derivative, batched over ALL map
                         points with masks — no per-inlier gather.
  - `observation_counts` EstablishObservationSets (:281-323): per-pose inlier
                         counts for each selection (participation = count > 5).
  - `order_and_filter`   OrderAndFilterUserInput (:325-455): the branchy
                         overlap-dedup / reorder / backprop-bounds logic —
                         tiny and data-dependent, so it runs on host numpy.

Deviation (documented): the reference initializes the 1-param fit at
theta0 = acos(|dx|/len) (EMinput.cpp:163-166), discarding the segment's
orientation sign; we initialize at atan2(dy, dx), which starts the descent at
the current segment orientation. Same objective, strictly better-conditioned
start; fixed points agree on all tested inputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.geometry import dist_to_segment

Array = jax.Array

VERIFY_THRESHOLD = 0.05     # m  (HitLSLAM.cpp:221)
INLIER_THRESHOLD = 0.03     # m  (EMinput.cpp:206, :287)
ENDPOINT_STABLE = 0.05      # m  (EMinput.cpp:201-203)
MIN_POSE_INLIERS = 5        # strictly-greater gate (EMinput.cpp:303-310)
SEGFIT_ITERS = 25           # Ceres max_num_iterations (EMinput.cpp:174)
MAX_ADJUST_ROUNDS = 32      # safety bound on the outer while loop


@partial(jax.jit, static_argnames=())
def verify_input(world_pts: Array, mask: Array, selected: Array) -> Array:
    """For each of the K selected points, is some map point within 0.05 m?

    world_pts: [P, N, 2], mask: [P, N], selected: [K, 2] -> [K] bool.
    """
    d2 = jnp.sum(
        (world_pts[None] - selected[:, None, None, :]) ** 2, axis=-1
    )  # [K, P, N]
    d2 = jnp.where(mask[None], d2, jnp.inf)
    return jnp.min(d2, axis=(1, 2)) < VERIFY_THRESHOLD**2


def _segfit_theta(pts: Array, w: Array, cm: Array, half_len: Array,
                  theta0: Array) -> Array:
    """25 Newton steps on theta for the fixed-center, fixed-length segment
    fit.

    Minimizes sum_i w_i * dist(p_i, seg(theta))^2 where
    seg(theta) = [cm - L a, cm + L a], a = (cos theta, sin theta).
    Closed-form derivative; clamped ends handled exactly.

    The inner step is reduced algebraically so each iteration is ~4 fused
    elementwise passes with NO sqrt or division (this runs 25x per round
    over the full point map — it was the single largest device cost of the
    repair cycle). With t = rel.a, perp = rel.n, tc = clip(t, -L, L):
      - 0.5 dF/dtheta = sum -perp * tc    (interior: -t perp; end zones:
        0.5 d|e|^2/dtheta = e.de/dtheta = -sign(t) L (e.n) = -sign(t) L perp)
      - curvature     = sum |t * tc|      (interior: the PSD GN t^2; end
        zones: the EXACT Newton 0.5 d2|e|^2/dtheta2 = L^2 + L(e.a) = L|t| —
        the GN jac^2 = L^2 perp^2/|e|^2 vanishes at the optimum there, and
        undamped steps oscillated without converging on end-zone-dominated
        inlier sets; the pre-review form also carried a flipped end-zone
        GRADIENT sign that pushed theta away from the minimum)
    Weights fold in by pre-zeroing rel (w in {0,1}): zeroed points
    contribute exactly zero to both sums.
    """
    relw = (pts - cm) * w[:, None]          # [M, 2]; non-inliers -> 0

    def body(_, theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        t = relw[:, 0] * c + relw[:, 1] * s          # rel . a
        perp = relw[:, 1] * c - relw[:, 0] * s       # rel . n
        tc = jnp.clip(t, -half_len, half_len)
        num = jnp.sum(-perp * tc)
        den = jnp.sum(jnp.abs(t * tc))
        return theta - num / jnp.maximum(den, 1e-9)

    # Python-unrolled: 25 static GN steps; a fori_loop here costs ~15us per
    # step when nested inside the endpoint-adjust while_loop (see
    # solver/lm.py default-solver notes on nested sequential loops).
    theta = theta0
    for _ in range(SEGFIT_ITERS):
        theta = body(0, theta)
    return theta


@jax.jit
def endpoint_adjust_batch(world_pts: Array, mask: Array, segs: Array) -> Array:
    """Refit S segments segs=[S,2,2] against the map until each segment's
    endpoints move less than 0.05 m. Returns the refit [S, 2, 2] endpoints.

    Matches AutomaticEndpointAdjustment: each round gathers inliers within
    0.03 m of the *current* segment, then re-fits orientation about the
    round's inlier-centroid-independent midpoint (the reference fits about
    the segment midpoint with fixed half-length; so do we).

    All S refits share ONE while_loop: converged segments are frozen (their
    update is masked out), so every segment follows exactly the trajectory
    it would take solo — but the expensive inlier sweeps over the full map
    run once per ROUND instead of once per round per segment. (Measured:
    sequential endpoint refits were the largest device-side cycle cost,
    ~1.2 ms each, since sequential while_loops don't pipeline on TPU.)

    The theta fit itself runs over the full [M] map with pre-zeroed
    weights rather than a gathered inlier buffer: prefix-sum compaction of
    262k rows was MEASURED slower (8.2 ms vs 5.5) than simply sweeping — on
    this hardware one cumsum + one scatter over [M] costs more than the
    whole reduced 25-step fit (see _segfit_theta's algebraic reduction).
    """
    flat = world_pts.reshape(-1, 2)
    fmask = mask.reshape(-1)
    dtype = segs.dtype
    S = segs.shape[0]

    def cond(state):
        _, moved, it = state
        return jnp.any(moved > ENDPOINT_STABLE) & (it < MAX_ADJUST_ROUNDS)

    def body(state):
        s, moved_prev, it = state
        active = moved_prev > ENDPOINT_STABLE           # [S]
        p1, p2 = s[:, 0], s[:, 1]                       # [S,2]
        d = dist_to_segment(p1[:, None], p2[:, None], flat[None])  # [S,M]
        w = (fmask[None] & (d < INLIER_THRESHOLD)).astype(dtype)
        cm = 0.5 * (p1 + p2)
        delta = p1 - p2            # axis oriented cm -> p1 so endpoint
        half_len = 0.5 * jnp.linalg.norm(delta, axis=-1)  # pairing stable
        theta0 = jnp.arctan2(delta[:, 1], delta[:, 0])
        theta = jax.vmap(_segfit_theta, in_axes=(None, 0, 0, 0, 0))(
            flat, w, cm, half_len, theta0)
        a = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)  # [S,2]
        new1 = cm + half_len[:, None] * a
        new2 = cm - half_len[:, None] * a
        # endpoint pairing follows the reference (SegFitEM returns cm+La as
        # endpoint 1); movement is measured per endpoint
        moved = jnp.maximum(
            jnp.linalg.norm(new1 - p1, axis=-1),
            jnp.linalg.norm(new2 - p2, axis=-1),
        )
        new_s = jnp.stack([new1, new2], axis=1)
        s_out = jnp.where(active[:, None, None], new_s, s)
        moved_out = jnp.where(active, moved, jnp.zeros_like(moved))
        return s_out, moved_out, it + 1

    out, _, _ = lax.while_loop(
        cond, body, (segs, jnp.full((S,), jnp.inf, dtype), 0)
    )
    return out


@jax.jit
def endpoint_adjust(world_pts: Array, mask: Array, seg: Array) -> Array:
    """Single-segment convenience wrapper over endpoint_adjust_batch."""
    return endpoint_adjust_batch(world_pts, mask, seg[None])[0]


@jax.jit
def observation_counts(world_pts: Array, mask: Array, sel: Array) -> tuple[Array, Array]:
    """Per-pose inlier counts against the two refit selections.

    world_pts [P,N,2], sel [4,2] -> (count_first [P], count_second [P]).
    """
    d1 = dist_to_segment(sel[0], sel[1], world_pts)
    d2 = dist_to_segment(sel[2], sel[3], world_pts)
    c1 = jnp.sum((d1 < INLIER_THRESHOLD) & mask, axis=1)
    c2 = jnp.sum((d2 < INLIER_THRESHOLD) & mask, axis=1)
    return c1, c2


@dataclass
class OrderedSelection:
    """Host-side result of order_and_filter."""

    corrected_poses: np.ndarray   # ascending pose ids (first selection)
    anchor_poses: np.ndarray      # ascending pose ids (second selection)
    selected_points: np.ndarray   # [4,2], possibly swapped so anchors second
    backprop_start: int
    backprop_end: int

    @property
    def valid(self) -> bool:
        return self.backprop_start >= 0 and self.backprop_end >= 1


def order_and_filter(
    count_first: np.ndarray, count_second: np.ndarray, selected: np.ndarray
) -> OrderedSelection:
    """Replicates OrderAndFilterUserInput (EMinput.cpp:325-455).

    - participation gate: count > 5
    - overlap poses are removed from one or both sides
    - if the first selection covers LATER poses than the second, it is the
      corrected set and the second anchors; otherwise the roles (and the
      selected-point pairs) are swapped
    - backprop bounds = open interval between anchor max and corrected min.
    """
    first = np.nonzero(count_first > MIN_POSE_INLIERS)[0]
    second = np.nonzero(count_second > MIN_POSE_INLIERS)[0]
    sel = selected.copy()

    invalid = OrderedSelection(first, second, sel, -1, -1)
    if len(first) == 0 or len(second) == 0:
        return invalid

    overlap = np.intersect1d(first, second)
    if len(overlap) == len(first) and len(overlap) == len(second):
        return invalid  # complete overlap
    elif len(overlap) == len(first):
        second = np.setdiff1d(second, overlap)
    elif len(overlap) == len(second):
        first = np.setdiff1d(first, overlap)
    elif len(overlap) > 0:
        first = np.setdiff1d(first, overlap)
        second = np.setdiff1d(second, overlap)

    if len(first) == 0 or len(second) == 0:
        return invalid

    if first.min() > second.max():
        corrected, anchors = first, second
        bp = (int(second.max()) + 1, int(first.min()) - 1)
    elif first.max() < second.min():
        # user drew in the "wrong" order: swap pair roles
        sel = np.concatenate([selected[2:4], selected[0:2]], axis=0)
        corrected, anchors = second, first
        bp = (int(first.max()) + 1, int(second.min()) - 1)
    else:
        return invalid  # interleaved selections

    return OrderedSelection(corrected, anchors, sel, bp[0], bp[1])
