"""Display draw-list building + property tests on the correction engine."""

import numpy as np
import pytest

from hitl_slam_tpu.core.state import CorrectionType, SingleInput
from hitl_slam_tpu.gui.display import display_poses, display_selection
from hitl_slam_tpu.io.figure8 import generate_figure8, synthesize_correction
from hitl_slam_tpu.models.hitl.engine import HitLSLAM

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def test_display_poses_drawlist(small_state):
    dl = display_poses(small_state, max_points=500)
    P = small_state.num_poses
    assert len(dl.lines_p1) == P - 1            # trajectory polyline
    assert len(dl.points) <= 500 + P            # subsampled scans + poses
    assert len(dl.points_col) == len(dl.points)
    s = dl.to_json()
    from hitl_slam_tpu.gui.drawlist import DrawList

    back = DrawList.from_json(s)
    assert back.points == dl.points
    # selection overlay adds lines + circles
    display_selection(dl, [np.array([0, 0]), np.array([1, 1])])
    assert len(dl.circles) == 2


def test_random_corrections_never_corrupt_state():
    """Property: arbitrary (mostly nonsense) correction inputs either get
    rejected or produce finite poses; undo always restores exactly."""
    rng = np.random.default_rng(7)
    m = generate_figure8(num_poses=64, num_rays=90, seed=3,
                         drift_theta_bias=9e-4)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             constraint_capacity=512)

    types = [CorrectionType.LINE_SEGMENT, CorrectionType.COLINEAR,
             CorrectionType.PERPENDICULAR, CorrectionType.PARALLEL]
    n_accepted = 0
    for trial in range(8):
        if trial % 2 == 0:
            # random garbage clicks somewhere in the map bounding box
            sel = rng.uniform(-15, 15, (4, 2)).astype(np.float32)
        else:
            # plausible wall sketch on the current map
            try:
                sel = synthesize_correction(
                    m, range(40, 64), range(0, 20), (1, 0.0), (1, 0.0),
                    poses=eng.get_poses())
            except ValueError:
                continue
        before = eng.get_poses()
        t = types[trial % len(types)]
        eng.add_correction_points(int(t), sel[0], sel[1])
        eng.add_correction_points(int(t), sel[2], sel[3])
        rep = eng.run()
        poses = eng.get_poses()
        assert np.isfinite(poses).all(), (trial, rep.reason)
        if rep.accepted:
            n_accepted += 1
            assert eng.undo()
            np.testing.assert_array_equal(eng.get_poses(), before)
            # redo the correction so later trials see an evolved map
            eng.add_correction_points(int(t), sel[0], sel[1])
            eng.add_correction_points(int(t), sel[2], sel[3])
            eng.run()
        else:
            np.testing.assert_array_equal(poses, before)
    assert n_accepted >= 1


def test_display_proposals_and_covariances():
    from hitl_slam_tpu.core.state import CorrectionType, SingleInput
    from hitl_slam_tpu.gui.display import (display_covariances,
                                           display_proposals)
    from hitl_slam_tpu.gui.drawlist import DrawList
    from hitl_slam_tpu.models.hitl.propose import Proposal

    dl = DrawList()
    sel = np.array([[0, 0], [1, 0], [5, 5], [6, 5]], np.float32)
    p = Proposal(input=SingleInput(CorrectionType.COLINEAR, 0, sel),
                 anchor_pose=3, corrected_pose=9, score=0.7,
                 drift=np.array([0.1, 0.0, 0.0]))
    display_proposals(dl, [p])
    assert len(dl.lines_p1) == 2 and len(dl.circles) == 2
    assert len(dl.text) == 1 and "score" in dl.text[0][3]

    dl2 = DrawList()
    poses = np.zeros((4, 3), np.float32)
    covs = np.tile(np.diag([0.04, 0.01, 0.001]).astype(np.float32),
                   (4, 1, 1))
    display_covariances(dl2, poses, covs, segments=12)
    # 4 ellipses x 12 segments
    assert len(dl2.lines_p1) == 4 * 12
    # ellipse extent ~ 3 sigma of the larger axis (0.2 * 3)
    pts = np.asarray(dl2.lines_p1)
    assert 0.45 < np.abs(pts[:, 0]).max() < 0.75


def test_proposal_precision_recall():
    """Measured quality floors for propose_corrections on maps with PLANTED
    loop-closure drift (VERDICT r2 item 10).

    Precision: fraction of proposals whose estimated drift direction agrees
    with the ground-truth drift (cos > 0.5) — measured 6/7 = 0.857 across
    seeds {7, 11, 23}; floor 0.7. Recall: every drifted map yields at least
    one strongly-aligned (cos > 0.9) proposal — measured 3/3."""
    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.propose import propose_corrections

    total, aligned = 0, 0
    for seed in (7, 11, 23):
        m = generate_figure8(num_poses=256, num_rays=120, seed=seed,
                             drift_theta_bias=6e-4, num_laps=2)
        st = make_map_state(m.poses, m.covariances, m.point_clouds,
                            m.normal_clouds)
        props = propose_corrections(st, max_proposals=4, seed=seed)
        assert props, f"no proposals on drifted map seed {seed}"
        cosines = []
        for p in props:
            j = p.corrected_pose
            gt = (m.gt_poses[j] - m.poses[j])[:2]
            est = p.drift[:2]
            denom = max(np.linalg.norm(est) * np.linalg.norm(gt), 1e-12)
            cosines.append(float(est @ gt / denom))
        total += len(cosines)
        aligned += sum(c > 0.5 for c in cosines)
        assert max(cosines) > 0.9, (seed, cosines)   # recall: >=1 strong hit
    assert aligned / total >= 0.7, (aligned, total)  # measured 0.857


def test_proposal_zero_on_clean_map():
    """A drift-free map must produce ZERO proposals; a noise-only map may
    produce a few but their magnitudes stay below the noise floor
    (VERDICT r2 item 10 clean-map assertion)."""
    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.propose import propose_corrections

    m = generate_figure8(num_poses=256, num_rays=120, seed=5,
                         drift_theta_bias=0.0, noise_trans=0.0,
                         noise_theta=0.0, num_laps=2)
    st = make_map_state(m.poses, m.covariances, m.point_clouds,
                        m.normal_clouds)
    assert propose_corrections(st, max_proposals=4, seed=5) == []

    m2 = generate_figure8(num_poses=256, num_rays=120, seed=5,
                          drift_theta_bias=0.0, num_laps=2)
    st2 = make_map_state(m2.poses, m2.covariances, m2.point_clouds,
                         m2.normal_clouds)
    for p in propose_corrections(st2, max_proposals=4, seed=5):
        assert np.linalg.norm(p.drift[:2]) < 0.15, p.drift
