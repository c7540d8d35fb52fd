"""Golden-session regression: a committed stfs + log pair must replay to the
committed poses across rounds/refactors (the reference's recorded-log
regression method, SURVEY.md section 4, made an actual CI check).

Tolerance is loose (2 cm / 0.01 rad) so numeric-path changes (solver swaps,
precision tweaks) pass while behavioral regressions fail.
"""

import os

import numpy as np

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_golden_session_replay():
    from hitl_slam_tpu.io import logs, stfs
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    data = stfs.load_stfs_covars(os.path.join(DATA, "golden.stfs.covars"))
    eng = HitLSLAM()
    eng.init(data.poses, data.covariances, data.point_clouds,
             data.normal_clouds, constraint_capacity=256)
    entries = logs.load_log(os.path.join(DATA, "golden.log"))
    for e in entries:
        rep = eng.replay_log(e)
        assert rep.accepted, rep.reason
    expected = np.loadtxt(os.path.join(DATA, "golden_expected_poses.txt"))
    got = eng.get_poses()
    np.testing.assert_allclose(got[:, :2], expected[:, :2], atol=0.02)
    dth = np.arctan2(np.sin(got[:, 2] - expected[:, 2]),
                     np.cos(got[:, 2] - expected[:, 2]))
    np.testing.assert_allclose(dth, 0.0, atol=0.01)


def test_golden_session_replay_tight():
    """Tight companion golden (VERDICT r3 item 9): same session, expected
    poses frozen from the DEFAULT solver at 8-decimal precision, asserted
    at 2 mm / 1 mrad. The loose golden above survives solver swaps; this
    one pins the default numeric path so a ~1.5 cm systematic regression
    cannot slip under the 2 cm behavioral tolerance. If a deliberate
    default-solver change trips it, regenerate
    golden_expected_poses_tight.txt and say so in the commit message."""
    from hitl_slam_tpu.io import logs, stfs
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    data = stfs.load_stfs_covars(os.path.join(DATA, "golden.stfs.covars"))
    eng = HitLSLAM()
    eng.init(data.poses, data.covariances, data.point_clouds,
             data.normal_clouds, constraint_capacity=256)
    for e in logs.load_log(os.path.join(DATA, "golden.log")):
        rep = eng.replay_log(e)
        assert rep.accepted, rep.reason
    expected = np.loadtxt(
        os.path.join(DATA, "golden_expected_poses_tight.txt"))
    got = eng.get_poses()
    np.testing.assert_allclose(got[:, :2], expected[:, :2], atol=0.002)
    dth = np.arctan2(np.sin(got[:, 2] - expected[:, 2]),
                     np.cos(got[:, 2] - expected[:, 2]))
    np.testing.assert_allclose(dth, 0.0, atol=0.001)


def test_golden_large_session_replay():
    """Reference-scale frozen golden (VERDICT r2 item 1 fallback: the real
    UMass dataset is unreachable — zero network egress in this image, and
    no dataset is bundled with the reference checkout): 1024 poses x 2 laps
    with full 16-field covariances (~520 KB gzipped committed artifact, NOT
    regenerated at test time), a 2-correction sequential session log, and
    frozen expected poses. Guards the full engine path at config scale."""
    import gzip
    import shutil
    import tempfile

    from hitl_slam_tpu.io import logs, stfs
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    with tempfile.NamedTemporaryFile(suffix=".stfs.covars") as tf:
        with gzip.open(os.path.join(DATA, "golden_large.stfs.covars.gz")) as f:
            shutil.copyfileobj(f, tf)
        tf.flush()
        data = stfs.load_stfs_covars(tf.name)
    assert len(data.poses) == 1024
    # the committed covariances are the generator's accumulated-odometry
    # covariances, not placeholders
    assert float(np.trace(data.covariances[-1])) > float(
        np.trace(data.covariances[1]))
    eng = HitLSLAM()
    eng.init(data.poses, data.covariances, data.point_clouds,
             data.normal_clouds, constraint_capacity=16384)
    for e in logs.load_log(os.path.join(DATA, "golden_large.log")):
        rep = eng.replay_log(e)
        assert rep.accepted, rep.reason
    expected = np.loadtxt(os.path.join(DATA, "golden_large_expected_poses.txt"))
    got = eng.get_poses()
    np.testing.assert_allclose(got[:, :2], expected[:, :2], atol=0.02)
    dth = np.arctan2(np.sin(got[:, 2] - expected[:, 2]),
                     np.cos(got[:, 2] - expected[:, 2]))
    np.testing.assert_allclose(dth, 0.0, atol=0.01)
