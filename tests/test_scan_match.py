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
    pose, score = correlative_match(field, center, scan, mask,
                                    jnp.asarray(guess), params)
    pose = np.asarray(pose)
    assert float(score) > 0.3
    assert abs(pose[0] - true_pose[0]) < 0.16, (pose, true_pose)
    assert abs(pose[1] - true_pose[1]) < 0.16
    dth = np.arctan2(np.sin(pose[2] - true_pose[2]),
                     np.cos(pose[2] - true_pose[2]))
    assert abs(dth) < 0.06
