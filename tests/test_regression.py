"""Replay-log determinism and session-regression tests (the reference's
de-facto regression method, SURVEY.md section 4: recorded log + stfs pair)."""

import numpy as np

from hitl_slam_tpu.core.state import CorrectionType, SingleInput
from hitl_slam_tpu.io import logs, stfs
from hitl_slam_tpu.io.figure8 import generate_figure8, synthesize_correction
from hitl_slam_tpu.models.hitl.engine import HitLSLAM
import pytest

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def _session(m):
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             constraint_capacity=512)
    return eng


def test_replay_is_deterministic():
    m = generate_figure8(num_poses=96, num_rays=120, seed=5,
                         drift_theta_bias=8e-4)
    sel = synthesize_correction(m, range(60, 96), range(0, 30),
                                (1, 0.0), (1, 0.0))
    inp = SingleInput(CorrectionType.COLINEAR, 0, sel)
    p1 = None
    for _ in range(2):
        eng = _session(m)
        rep = eng.replay_log(inp)
        assert rep.accepted
        poses = eng.get_poses()
        if p1 is None:
            p1 = poses
        else:
            np.testing.assert_array_equal(poses, p1)


def test_log_roundtrip_replays_identically(tmp_path):
    """Write session history to a log file, reload, replay -> same poses
    (the reference's SIGINT log -> -L -> 'l' cycle)."""
    m = generate_figure8(num_poses=96, num_rays=120, seed=5,
                         drift_theta_bias=8e-4)
    sel = synthesize_correction(m, range(60, 96), range(0, 30),
                                (1, 0.0), (1, 0.0))

    eng1 = _session(m)
    eng1.add_correction_points(int(CorrectionType.COLINEAR), sel[0], sel[1])
    eng1.add_correction_points(int(CorrectionType.COLINEAR), sel[2], sel[3])
    rep = eng1.run()
    assert rep.accepted
    path = str(tmp_path / "s.log")
    logs.save_log(path, eng1.get_input_history())

    eng2 = _session(m)
    for entry in logs.load_log(path):
        eng2.replay_log(entry)
    # log stores %.4f coordinates; replays must agree to that precision
    np.testing.assert_allclose(eng2.get_poses(), eng1.get_poses(), atol=5e-3)


def test_stfs_checkpoint_resume(tmp_path):
    """Save repaired state as .stfs.covars, reload into a fresh session,
    verify the state survives the round trip (checkpoint/resume path)."""
    m = generate_figure8(num_poses=96, num_rays=120, seed=5,
                         drift_theta_bias=8e-4)
    sel = synthesize_correction(m, range(60, 96), range(0, 30),
                                (1, 0.0), (1, 0.0))
    eng = _session(m)
    rep = eng.replay_log(SingleInput(CorrectionType.COLINEAR, 0, sel))
    assert rep.accepted

    path = str(tmp_path / "repaired.stfs.covars")
    poses = eng.get_poses()
    covs = eng.get_covariances()
    stfs.save_stfs_covars(path, "Repaired", 1.0, poses, covs,
                          m.point_clouds, m.normal_clouds)
    data = stfs.load_stfs_covars(path)
    np.testing.assert_allclose(data.poses, poses, atol=1e-3)
    eng2 = HitLSLAM()
    eng2.init(data.poses, data.covariances, data.point_clouds,
              data.normal_clouds, constraint_capacity=512)
    np.testing.assert_allclose(eng2.get_poses(), poses, atol=1e-3)
