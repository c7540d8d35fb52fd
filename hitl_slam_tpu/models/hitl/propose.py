"""Auto-proposed loop-closure corrections.

A capability the reference never shipped: the correlative scan matcher
(ops/scan_match.py — Olson-style correlation on the MXU) detects drift
between temporally-distant, spatially-near pose pairs and converts the
measured misalignment into ordinary human-style COLINEAR corrections — a
pair of drawn segments that feed the UNMODIFIED correction machinery
(verify -> EM refit -> ordering -> explicit -> backprop -> joint solve).
The human stays in the loop: proposals are rendered as dashed suggestions in
the GUI and a keystroke accepts one (cli.py, key 'a').

Pipeline per proposal:
  1. candidate pair: pose j and the spatially-nearest pose i with
     j - i > min_gap (loop closure, not odometry neighbors);
  2. correlative_match of pose j's scan against a likelihood field built
     from the anchor neighborhood's points -> matched pose + score;
  3. RANSAC segments (ops/ransac.py) from the anchor neighborhood and from
     pose j's scan placed at the MATCHED pose; the longest angle/offset/
     overlap-consistent pair becomes the correction: the anchor-side segment
     stays put, the corrected-side segment is mapped back through the
     inverse drift onto the CURRENT (drifted) rendering — exactly where a
     human would draw it;
  4. endpoints snap to the nearest observed points so the engine's 0.05 m
     verification gate (HitLSLAM.cpp:218-243) passes.

All candidates' likelihood fields, correlative matches, and RANSAC segment
extractions run as three vmapped device programs (fixed-size padded anchor
neighborhoods); only the final segment pairing / snapping / gating loop is
host numpy over the handful of survivors — so proposal generation scales to
batch auto-repair of large maps, not just interactive use.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...core.state import CorrectionType, MapState, SingleInput
from ...ops.ransac import RansacParams, extract_segments
from ...ops.scan_match import (ScanMatchParams, build_likelihood_field,
                               correlative_match)


@dataclass
class Proposal:
    input: SingleInput        # ready-to-run COLINEAR correction
    anchor_pose: int
    corrected_pose: int
    score: float              # correlation score (0..1)
    drift: np.ndarray         # [3] estimated (dx, dy, dtheta) at the pose


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _snap(endpoint: np.ndarray, pts: np.ndarray, max_d: float = 0.12):
    """Snap to the nearest observed point (the verify gate wants <0.05 m;
    the EM refit re-centers afterwards). None if nothing is close."""
    d = np.linalg.norm(pts - endpoint[None], axis=1)
    k = int(np.argmin(d))
    if d[k] > max_d:
        return None
    return pts[k]


def propose_corrections(
    state: MapState,
    max_proposals: int = 3,
    min_gap: int | None = None,
    pair_radius: float = 4.0,
    min_drift: float = 0.08,
    min_score: float = 0.35,
    max_ambiguity: float = 0.85,
    drift_sigma_gate: float = 4.0,
    neighborhood: int = 5,
    params: ScanMatchParams = ScanMatchParams(),
    seed: int = 0,
) -> list[Proposal]:
    poses = np.asarray(state.poses)
    P = len(poses)
    gap = min_gap if min_gap is not None else max(P // 4, 8)
    world = np.asarray(state.world_points())
    mask = np.asarray(state.point_mask)

    # --- candidate loop pairs: late pose j vs nearest early pose i ---------
    cands = []
    step = max(P // 48, 1)
    for j in range(P - 1, gap, -step):
        d = np.linalg.norm(poses[: j - gap, :2] - poses[j, :2], axis=1)
        i = int(np.argmin(d))
        if d[i] < pair_radius:
            cands.append((float(d[i]), i, j))
    cands.sort()
    # dedupe: one candidate per corrected-pose cluster
    chosen, used = [], np.zeros(P, bool)
    for d, i, j in cands:
        if used[max(0, j - gap // 2): j + gap // 2].any():
            continue
        used[j] = True
        chosen.append((i, j))
        if len(chosen) >= 2 * max_proposals:
            break

    if not chosen:
        return []

    # --- batched device stage: ALL candidates' likelihood fields,
    # correlative matches, and RANSAC segment extractions run as three
    # vmapped programs (the per-candidate Python loop of device calls was
    # the scaling bottleneck for batch auto-repair of large maps) ---------
    B = len(chosen)
    nb2 = 2 * neighborhood + 1
    N = world.shape[1]
    ii = np.array([i for i, _ in chosen])
    jj = np.array([j for _, j in chosen])
    win = ii[:, None] + np.arange(-neighborhood, neighborhood + 1)[None]
    pose_ok = (win >= 0) & (win < P)
    win = np.clip(win, 0, P - 1)
    a_pts = jnp.asarray(world[win].reshape(B, nb2 * N, 2), jnp.float32)
    a_mask = jnp.asarray((mask[win] & pose_ok[:, :, None]
                          ).reshape(B, nb2 * N))
    centers = jnp.asarray(poses[ii, :2], jnp.float32)
    scans = state.points[jj]
    scan_masks = state.point_mask[jj]
    guesses = jnp.asarray(poses[jj], jnp.float32)

    fields = jax.vmap(
        lambda p, m, c: build_likelihood_field(p, m, c, params))(
            a_pts, a_mask, centers)
    matched_b, score_b, ambiguity_b = jax.vmap(
        lambda f, c, s, sm, g: correlative_match(f, c, s, sm, g, params))(
            fields, centers, scans, scan_masks, guesses)
    matched_b = np.asarray(matched_b)
    score_b = np.asarray(score_b)
    ambiguity_b = np.asarray(ambiguity_b)

    rp = RansacParams(num_segments=8, min_inliers=10, min_length=0.8)
    keys = jax.random.split(jax.random.PRNGKey(seed), 2 * B)
    seg_a_b = jax.vmap(lambda p, m, k: extract_segments(p, m, k, rp))(
        a_pts, a_mask, keys[:B])
    # each scan placed at its MATCHED pose (where it should be)
    cb, sb = jnp.cos(jnp.asarray(matched_b[:, 2])), jnp.sin(
        jnp.asarray(matched_b[:, 2]))
    scans_w = jnp.stack([
        cb[:, None] * scans[..., 0] - sb[:, None] * scans[..., 1]
        + jnp.asarray(matched_b[:, 0:1]),
        sb[:, None] * scans[..., 0] + cb[:, None] * scans[..., 1]
        + jnp.asarray(matched_b[:, 1:2]),
    ], axis=-1)
    seg_c_b = jax.vmap(lambda p, m, k: extract_segments(p, m, k, rp))(
        scans_w, scan_masks, keys[B:])
    a_mask_np = np.asarray(a_mask)
    a_pts_np = np.asarray(a_pts)
    scan_mask_np = np.asarray(scan_masks)

    proposals: list[Proposal] = []
    for b, (i, j) in enumerate(chosen):
        if int(a_mask_np[b].sum()) < 50:
            continue
        matched = matched_b[b]
        score = float(score_b[b])
        drift = np.array([matched[0] - poses[j, 0], matched[1] - poses[j, 1],
                          _wrap(matched[2] - poses[j, 2])])
        if score < min_score:
            continue
        # reject aliased matches (a second, nearly-as-good alignment exists
        # elsewhere — typically a parallel wall)
        if float(ambiguity_b[b]) > max_ambiguity:
            continue
        if np.linalg.norm(drift[:2]) < min_drift and abs(drift[2]) < 0.02:
            continue
        # implausibly large jumps: gate by the pose's own uncertainty
        # (covariances shrink as corrections land, tightening this gate)
        cov_xy = np.asarray(state.covariances[j])[:2, :2]
        sigma = float(np.sqrt(max(np.trace(cov_xy), 0.0)))
        if np.linalg.norm(drift[:2]) > drift_sigma_gate * sigma + 0.3:
            continue
        if int(scan_mask_np[b].sum()) < 30:
            continue
        anchor_pts = a_pts_np[b][a_mask_np[b]]
        seg_a = jax.tree_util.tree_map(lambda a, b_=b: a[b_], seg_a_b)
        seg_c = jax.tree_util.tree_map(lambda a, b_=b: a[b_], seg_c_b)

        pair = _best_segment_pair(seg_a, seg_c)
        if pair is None:
            continue
        (a0, a1), (m0, m1) = pair
        c, s = np.cos(matched[2]), np.sin(matched[2])
        R_new = np.array([[c, -s], [s, c]])

        # map the corrected-side segment back onto the CURRENT rendering:
        # current = T_old . T_new^-1 . matched_endpoint
        co, so = np.cos(poses[j, 2]), np.sin(poses[j, 2])
        R_old = np.array([[co, -so], [so, co]])
        back = lambda q: R_old @ (R_new.T @ (q - matched[:2])) + poses[j, :2]
        c0, c1 = back(m0), back(m1)

        # snap all four endpoints onto observed points
        corr_pts = world[j][mask[j]]
        c0s, c1s = _snap(c0, corr_pts), _snap(c1, corr_pts)
        a0s, a1s = _snap(a0, anchor_pts), _snap(a1, anchor_pts)
        if any(v is None for v in (c0s, c1s, a0s, a1s)):
            continue
        sel = np.stack([c0s, c1s, a0s, a1s]).astype(np.float32)
        proposals.append(Proposal(
            input=SingleInput(CorrectionType.COLINEAR, 0, sel),
            anchor_pose=i, corrected_pose=j, score=score, drift=drift,
        ))
        if len(proposals) >= max_proposals:
            break
    return proposals


def _best_segment_pair(seg_a, seg_c, max_angle=0.18, max_offset=0.25,
                       min_overlap=0.6):
    """Longest (anchor, corrected) segment pair that is colinear-consistent
    after matching: similar direction, small line offset, overlapping spans.
    Returns ((a0, a1), (c0, c1)) trimmed to the common span, or None."""
    a_p1, a_p2 = np.asarray(seg_a.p1), np.asarray(seg_a.p2)
    a_ok = np.asarray(seg_a.valid)
    c_p1, c_p2 = np.asarray(seg_c.p1), np.asarray(seg_c.p2)
    c_ok = np.asarray(seg_c.valid)
    best, best_len = None, 0.0
    for ai in np.nonzero(a_ok)[0]:
        da = a_p2[ai] - a_p1[ai]
        la = np.linalg.norm(da)
        if la < 1e-6:
            continue
        ua = da / la
        na = np.array([-ua[1], ua[0]])
        for ci in np.nonzero(c_ok)[0]:
            dc = c_p2[ci] - c_p1[ci]
            lc = np.linalg.norm(dc)
            if lc < 1e-6:
                continue
            uc = dc / lc
            ang = np.arccos(np.clip(abs(ua @ uc), -1, 1))
            if ang > max_angle:
                continue
            off = abs((0.5 * (c_p1[ci] + c_p2[ci]) - a_p1[ai]) @ na)
            if off > max_offset:
                continue
            # overlap of projections on the anchor direction
            ta = sorted([0.0, la])
            tc = sorted([(c_p1[ci] - a_p1[ai]) @ ua,
                         (c_p2[ci] - a_p1[ai]) @ ua])
            o0, o1 = max(ta[0], tc[0]), min(ta[1], tc[1])
            if o1 - o0 < min_overlap:
                continue
            if o1 - o0 > best_len:
                best_len = o1 - o0
                anchor_seg = (a_p1[ai] + o0 * ua, a_p1[ai] + o1 * ua)
                # corrected segment trimmed to the same span, on its own line
                proj = lambda t: c_p1[ci] + np.clip(
                    (t - (c_p1[ci] - a_p1[ai]) @ ua)
                    / max(uc @ ua, 1e-6), 0.0, lc) * uc
                corr_seg = (proj(o0), proj(o1))
                best = (anchor_seg, corr_seg)
    return best
