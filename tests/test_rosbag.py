"""ROS1 .bag reader/writer + EnML bag ingestion tests."""

import numpy as np
import pytest

from hitl_slam_tpu.io import rosbag as rb
from hitl_slam_tpu.io.figure8 import generate_raw_stream


@pytest.fixture(scope="module")
def stream():
    return generate_raw_stream(num_steps=48, num_rays=120, seed=4)


def _cobot_bag_messages(scans, angles, rel):
    """Interleave CobotOdometryMsg deltas with LaserScan messages the way a
    real CoBot bag does (odometry at higher rate than laser)."""
    msgs = []
    t = 100.0
    inc = float(angles[1] - angles[0])
    for i in range(len(scans)):
        if i > 0:
            # split the inter-scan motion into two delta messages
            dr, dx, dy = float(rel[i][2]), float(rel[i][0]), float(rel[i][1])
            half = rb.serialize_cobot_odometry(dr / 2, dx / 2, dy / 2, t)
            msgs.append(("/Cobot/Odometry",
                         "vector_slam_msgs/CobotOdometryMsg", t, half))
            t += 0.01
            # second half is in the frame after the first half-rotation
            c, s = np.cos(dr / 2), np.sin(dr / 2)
            hx, hy = dx / 2, dy / 2
            lx = c * hx + s * hy
            ly = -s * hx + c * hy
            msgs.append(("/Cobot/Odometry",
                         "vector_slam_msgs/CobotOdometryMsg", t,
                         rb.serialize_cobot_odometry(dr / 2, lx, ly, t)))
            t += 0.01
        msgs.append(("laser", "sensor_msgs/LaserScan", t,
                     rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                             range_min=0.02, range_max=12.0,
                                             stamp=t)))
        t += 0.03
    return msgs


def test_bag_roundtrip_cobot(stream, tmp_path):
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "cobot.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))

    out_scans, out_angles, out_rel, set_loc = rb.bag_to_stream(path)
    assert set_loc is None
    assert out_scans.shape == (len(scans), len(angles))
    # angle_min + i*increment in f32 vs linspace: ~1e-5 rad reconstruction
    np.testing.assert_allclose(out_angles, angles, atol=1e-4)
    # non-finite (no-return) rays come back as range_max + 1, which the
    # episode builder's clip gate then discards
    expect = np.where(np.isfinite(np.stack(scans)), np.stack(scans), 13.0)
    np.testing.assert_allclose(out_scans, expect, atol=1e-5)
    # the two half-deltas compose back to the original relative motion
    np.testing.assert_allclose(out_rel[1:], rel[1:], atol=1e-4)
    np.testing.assert_allclose(out_rel[0], 0.0, atol=1e-6)


def test_bag_roundtrip_standardized_bz2(stream, tmp_path):
    """nav_msgs/Odometry absolute poses on 'odom' + bz2 chunk compression +
    a set_location message."""
    scans, angles, rel, gt, walls = stream
    # integrate rel into absolute odometry poses
    absp = np.zeros((len(scans), 3))
    for i in range(1, len(scans)):
        c, s = np.cos(absp[i - 1, 2]), np.sin(absp[i - 1, 2])
        absp[i, 0] = absp[i - 1, 0] + c * rel[i][0] - s * rel[i][1]
        absp[i, 1] = absp[i - 1, 1] + s * rel[i][0] + c * rel[i][1]
        absp[i, 2] = absp[i - 1, 2] + rel[i][2]
    msgs = [("set_location", "vector_slam_msgs/LocalizationMsg", 99.0,
             rb.serialize_localization(3.0, -2.0, 0.5))]
    t = 100.0
    inc = float(angles[1] - angles[0])
    for i in range(len(scans)):
        msgs.append(("odom", "nav_msgs/Odometry", t,
                     rb.serialize_odometry(*absp[i], stamp=t)))
        t += 0.01
        msgs.append(("laser", "sensor_msgs/LaserScan", t,
                     rb.serialize_laser_scan(scans[i], float(angles[0]), inc,
                                             stamp=t)))
        t += 0.04
    path = str(tmp_path / "std.bag")
    rb.write_bag(path, msgs, compression="bz2")

    out_scans, out_angles, out_rel, set_loc = rb.bag_to_stream(path)
    assert set_loc == (3.0, -2.0, pytest.approx(0.5, abs=1e-6))
    np.testing.assert_allclose(out_rel[1:], rel[1:], atol=1e-4)


def test_bag_reader_rejects_garbage(tmp_path):
    p = tmp_path / "notabag.bag"
    p.write_bytes(b"this is not a bag file")
    with pytest.raises(ValueError, match="version line"):
        list(rb.read_messages(str(p)))


def test_bag_end_to_end_enml_to_hitl(stream, tmp_path):
    """The VERDICT acceptance path: cli_enml -b file.bag -o out produces a
    .stfs.covars that the HitL CLI loads and repairs."""
    scans, angles, rel, gt, walls = stream
    path = str(tmp_path / "session.bag")
    rb.write_bag(path, _cobot_bag_messages(scans, angles, rel))

    from hitl_slam_tpu import cli_enml

    out = str(tmp_path / "bagout")
    rc = cli_enml.main(["-b", path, "-o", out, "--max-history", "6"])
    assert rc == 0

    from hitl_slam_tpu.io import stfs

    data = stfs.load_stfs_covars(out + ".stfs.covars")
    assert len(data.poses) > 5
    assert np.isfinite(data.poses).all()

    # the HitL engine ingests the result
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    eng = HitLSLAM()
    eng.init(data.poses, data.covariances, data.point_clouds,
             data.normal_clouds, constraint_capacity=256)
    assert eng.get_poses().shape == data.poses.shape
