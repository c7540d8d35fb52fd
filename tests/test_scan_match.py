"""Correlative scan matching: recover a known perturbation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.ops.scan_match import (

    ScanMatchParams,
    build_likelihood_field,
    correlative_match,
)

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def setup():
    m = generate_figure8(num_poses=48, num_rays=180, seed=9,
                         drift_theta_bias=0.0, noise_trans=0.0,
                         noise_theta=0.0)
    # world map points from all poses (ground truth == poses here)
    pts, msk = [], []
    for i in range(48):
        c, s = np.cos(m.gt_poses[i, 2]), np.sin(m.gt_poses[i, 2])
        pts.append(m.point_clouds[i] @ np.array([[c, -s], [s, c]]).T
                   + m.gt_poses[i, :2])
    map_pts = np.concatenate(pts, 0).astype(np.float32)
    return m, map_pts


@pytest.mark.parametrize("offset", [
    (0.3, -0.2, 0.1),
    (-0.5, 0.4, -0.15),
    (0.0, 0.0, 0.0),
])
def test_recovers_offset(setup, offset):
    m, map_pts = setup
    # coarse resolution keeps the CPU-test conv cheap; TPU uses 0.05
    params = ScanMatchParams(resolution=0.1, window=1.0, angle_window=0.3,
                             num_angles=31)
    i = 20
    true_pose = m.gt_poses[i].astype(np.float32)
    center = jnp.asarray(true_pose[:2])
    field = build_likelihood_field(
        jnp.asarray(map_pts), jnp.ones(len(map_pts), bool), center, params)

    scan = jnp.asarray(m.point_clouds[i])
    mask = jnp.ones(len(m.point_clouds[i]), bool)
    # guess = truth + offset; matcher should undo the offset
    guess = true_pose + np.array(offset, np.float32)
    pose, score, ambiguity = correlative_match(field, center, scan, mask,
                                               jnp.asarray(guess), params)
    pose = np.asarray(pose)
    assert float(score) > 0.3
    assert float(ambiguity) <= 1.0
    assert abs(pose[0] - true_pose[0]) < 0.16, (pose, true_pose)
    assert abs(pose[1] - true_pose[1]) < 0.16
    dth = np.arctan2(np.sin(pose[2] - true_pose[2]),
                     np.cos(pose[2] - true_pose[2]))
    assert abs(dth) < 0.06


def test_grid_match_recall_vs_brute_force():
    """Bound the approximate-NN miss rate on a dense multi-lap cloud
    (VERDICT r1 item 8): the query-centered sub-cell window must find a
    match wherever brute force does (<0.1% missed), and suboptimal picks
    must average <1 cm of excess distance."""
    import jax.numpy as jnp

    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.ops.correspond import (
        MAX_STF_ANGLE_ERROR, POINT_MATCH_THRESHOLD, grid_match)
    from hitl_slam_tpu.ops.geometry import pose_to_world, rotate

    m = generate_figure8(num_poses=64, num_rays=120, seed=3)
    st = make_map_state(m.poses, m.covariances, m.point_clouds,
                        m.normal_clouds)
    world = pose_to_world(st.poses[:, None, :], st.points)
    wnrm = rotate(st.poses[:, 2][:, None], st.normals)
    mm = grid_match(world, wnrm, st.point_mask)

    P, N, _ = world.shape
    M = P * N
    pts = np.asarray(world).reshape(M, 2)
    nrm = np.asarray(wnrm).reshape(M, 2)
    mask = np.asarray(st.point_mask).reshape(M)
    pose_id = np.repeat(np.arange(P), N)
    t2 = POINT_MATCH_THRESHOLD**2
    min_cos = float(np.cos(MAX_STF_ANGLE_ERROR))
    best = np.full(M, np.inf, np.float32)
    for s in range(0, M, 2048):
        e = min(s + 2048, M)
        d2 = ((pts[s:e, None, :] - pts[None, :, :]) ** 2).sum(-1)
        cos = nrm[s:e] @ nrm.T
        ok = (mask[s:e, None] & mask[None, :]
              & (pose_id[s:e, None] != pose_id[None, :])
              & (d2 < t2) & (cos > min_cos))
        best[s:e] = np.where(ok, d2, np.inf).min(1)
    bvalid = np.isfinite(best)
    gvalid = np.asarray(mm.valid)

    missed = (bvalid & ~gvalid).sum()
    assert missed <= 0.001 * max(bvalid.sum(), 1), (
        f"{missed} of {bvalid.sum()} brute-force matches missed")
    both = bvalid & gvalid
    excess = np.asarray(mm.dist)[both] - np.sqrt(best[both])
    sub = excess > 1e-6
    if sub.any():
        assert excess[sub].mean() < 0.01, excess[sub].mean()


def test_auto_proposed_corrections_repair_drift():
    """VERDICT r1 item 6: a drifted map is repaired using ONLY auto-proposed
    corrections (correlative matcher -> COLINEAR suggestions -> ordinary
    correction machinery)."""
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = generate_figure8(num_poses=256, num_rays=120, seed=7,
                         drift_theta_bias=6e-4, num_laps=2)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=8192)

    def gt_err(poses):
        a = np.asarray(poses[:, :2], np.float64)
        b = np.asarray(m.gt_poses[:, :2], np.float64)
        ca, cb = a.mean(0), b.mean(0)
        H = (a - ca).T @ (b - cb)
        U, _, Vt = np.linalg.svd(H)
        R = (U @ Vt).T
        if np.linalg.det(R) < 0:
            Vt[-1] *= -1
            R = (U @ Vt).T
        return float(np.linalg.norm((a - ca) @ R.T + cb - b, axis=1).mean())

    before = gt_err(eng.get_poses())
    applied = 0
    for rnd in range(3):
        props = eng.propose_corrections(max_proposals=4, seed=rnd)
        accepted = False
        for p in props:
            rep = eng.replay_log(p.input)
            if rep.accepted:
                applied += 1
                accepted = True
                break
        if not accepted:
            break
    after = gt_err(eng.get_poses())
    assert applied >= 1
    assert after < before * 0.8, (before, after, applied)
