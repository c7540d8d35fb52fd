"""LTF point-to-line localization against a vector map."""

import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.ops.ltf import localize_against_map, match_segments


@pytest.fixture(scope="module")
def setup():
    m = generate_figure8(num_poses=48, num_rays=200, seed=9,
                         drift_theta_bias=0.0, noise_trans=0.0,
                         noise_theta=0.0)
    segs = jnp.asarray(m.walls, jnp.float32)  # GT vector map
    return m, segs


def test_match_segments(setup):
    m, segs = setup
    i = 12
    gt = m.gt_poses[i]
    c, s = np.cos(gt[2]), np.sin(gt[2])
    world = m.point_clouds[i] @ np.array([[c, -s], [s, c]]).T + gt[:2]
    idx, valid = match_segments(segs, jnp.asarray(world),
                                jnp.ones(len(world), bool))
    v = np.asarray(valid)
    assert v.mean() > 0.9  # noiseless scan lies on the walls
    # matched distances are tiny
    from hitl_slam_tpu.ops.ltf import point_segment_geometry

    dist, _, _ = point_segment_geometry(segs, jnp.asarray(world))
    d = np.asarray(dist)[np.arange(len(world)), np.asarray(idx)]
    assert np.median(d[v]) < 0.02


@pytest.mark.parametrize("offset", [
    (0.15, -0.1, 0.04), (-0.2, 0.1, -0.05), (0.0, 0.0, 0.0),
])
def test_localize_recovers_pose(setup, offset):
    m, segs = setup
    i = 12
    gt = m.gt_poses[i].astype(np.float32)
    guess = gt + np.array(offset, np.float32)
    pose, cost, n_inl = localize_against_map(
        segs, jnp.asarray(m.point_clouds[i]),
        jnp.ones(len(m.point_clouds[i]), bool), jnp.asarray(guess))
    pose = np.asarray(pose)
    assert int(n_inl) > 50
    assert abs(pose[0] - gt[0]) < 0.03, (pose, gt)
    assert abs(pose[1] - gt[1]) < 0.03
    dth = np.arctan2(np.sin(pose[2] - gt[2]), np.cos(pose[2] - gt[2]))
    assert abs(dth) < 0.02


def test_localize_with_curated_map(setup):
    """Close the loop: LTVM-curated vectors serve as the localization map."""
    import jax

    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.models.ltvm.curator import CuratorParams, LongTermVectorMap
    from hitl_slam_tpu.ops.ransac import RansacParams
    from hitl_slam_tpu.ops.sdf import SdfParams

    m, _ = setup
    st = make_map_state(m.gt_poses, m.covariances, m.point_clouds,
                        m.normal_clouds)
    params = CuratorParams()
    params.sdf = SdfParams(image_resolution=0.1)
    params.ransac = RansacParams(num_segments=24, inlier_threshold=0.08,
                                 min_inliers=30, min_length=1.0)
    cur = LongTermVectorMap(params)
    vectors = cur.curate(st.poses, st.points, st.point_mask)
    segs = jnp.asarray(
        np.array([[*v.p1, *v.p2] for v in vectors], np.float32))

    i = 20
    gt = m.gt_poses[i].astype(np.float32)
    guess = gt + np.array([0.2, -0.15, 0.05], np.float32)
    pose, cost, n_inl = localize_against_map(
        segs, jnp.asarray(m.point_clouds[i]),
        jnp.ones(len(m.point_clouds[i]), bool), jnp.asarray(guess),
        threshold=0.3)
    pose = np.asarray(pose)
    assert int(n_inl) > 40
    assert np.linalg.norm(pose[:2] - gt[:2]) < 0.1, (pose, gt)
