"""End-to-end repair-cycle tests on the synthetic drifted figure-8 map.

These exercise the full reference flow (SURVEY.md section 3.2): verify ->
EM refit -> order/filter -> explicit -> backprop -> joint LM solve, via the
session engine — the TPU analog of replaying a correction log.
"""

import numpy as np
import pytest

from hitl_slam_tpu.core.state import CorrectionType, SingleInput
from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.models.hitl.engine import HitLSLAM


def _wall_points_world(m, pose_range, wall_y=0.0, tol=0.25):
    """Drifted world-frame positions of points that in GT lie on the bottom
    wall, for poses in pose_range. Returns [K,2] plus per-pose counts."""
    pts, counts = [], []
    for i in pose_range:
        gt = m.gt_poses[i]
        c, s = np.cos(gt[2]), np.sin(gt[2])
        Rg = np.array([[c, -s], [s, c]])
        world_gt = m.point_clouds[i] @ Rg.T + gt[:2]
        on_wall = np.abs(world_gt[:, 1] - wall_y) < tol
        dp = m.poses[i]
        c2, s2 = np.cos(dp[2]), np.sin(dp[2])
        Rd = np.array([[c2, -s2], [s2, c2]])
        world_drift = m.point_clouds[i][on_wall] @ Rd.T + dp[:2]
        pts.append(world_drift)
        counts.append(int(on_wall.sum()))
    return np.concatenate(pts, axis=0), counts


def _fit_segment(pts):
    """PCA segment through a point blob, endpoints snapped to the nearest
    actual points (a human clicks on rendered observations)."""
    cm = pts.mean(axis=0)
    u, s, vt = np.linalg.svd(pts - cm, full_matrices=False)
    d = vt[0]
    t = (pts - cm) @ d
    lo, hi = np.quantile(t, 0.02), np.quantile(t, 0.98)
    ends = np.stack([cm + lo * d, cm + hi * d])
    snapped = np.stack(
        [pts[np.argmin(np.linalg.norm(pts - e, axis=1))] for e in ends]
    )
    return snapped.astype(np.float32)


@pytest.fixture(scope="module")
def drifted_map():
    return generate_figure8(num_poses=96, num_rays=120, seed=5,
                            drift_theta_bias=8e-4)


@pytest.fixture()
def session(drifted_map):
    m = drifted_map
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=1024)
    return eng


def _make_correction(m, ctype):
    """Draw the late appearance of the bottom wall (corrected, first pair)
    and the early appearance (anchor, second pair)."""
    late, late_counts = _wall_points_world(m, range(60, 96))
    early, early_counts = _wall_points_world(m, range(0, 30))
    assert len(late) > 50 and len(early) > 50
    seg_late = _fit_segment(late)
    seg_early = _fit_segment(early)
    sel = np.concatenate([seg_late, seg_early], axis=0)
    return SingleInput(ctype, 0, sel)


def test_colinear_correction_cycle(session, drifted_map):
    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    report = session.replay_log(inp)
    assert report.accepted, report.reason
    assert report.num_new_constraints > 0
    # the first correction's solve starts near-satisfied by construction
    # (odometry targets rebuilt from current poses); allow the f32 noise floor
    assert report.final_cost <= report.initial_cost + 1e-9
    poses = session.get_poses()
    assert poses.shape == m.poses.shape
    assert np.isfinite(poses).all()
    # the corrected late poses should now see the wall more level: spread of
    # late wall points around the early wall line shrinks vs. before
    def wall_spread(poses_arr):
        out = []
        for i in range(60, 96):
            gt = m.gt_poses[i]
            c, s = np.cos(gt[2]), np.sin(gt[2])
            world_gt = m.point_clouds[i] @ np.array([[c, -s], [s, c]]).T + gt[:2]
            on_wall = np.abs(world_gt[:, 1]) < 0.25
            dp = poses_arr[i]
            c2, s2 = np.cos(dp[2]), np.sin(dp[2])
            w = m.point_clouds[i][on_wall] @ np.array([[c2, -s2], [s2, c2]]).T + dp[:2]
            out.append(w)
        pts = np.concatenate(out, axis=0)
        return np.std(pts[:, 1])

    before = wall_spread(m.poses)
    after = wall_spread(poses)
    assert after < before, (before, after)


@pytest.mark.full
def test_run_via_click_state_machine(session, drifted_map):
    """Drive the same correction through addCorrectionPoints + run()."""
    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    mods = int(CorrectionType.COLINEAR)
    session.add_correction_points(mods, inp.points[0], inp.points[1])
    assert session.pending_type == CorrectionType.COLINEAR
    session.add_correction_points(mods, inp.points[2], inp.points[3])
    assert session.correction_type == CorrectionType.COLINEAR
    report = session.run()
    assert report.accepted, report.reason
    assert len(session.get_input_history()) == 1
    # input state machine reset afterwards
    assert session.pending_type == CorrectionType.UNKNOWN
    assert session.selected_points == []


@pytest.mark.full
def test_speculative_dispatch_hit_and_equivalence(drifted_map):
    """The cycle dispatched at selection-complete time (during the human
    pause) must be consumed by run() when the state is unchanged, and give
    bit-identical results to the non-speculative path (VERDICT r2 item 4)."""
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    mods = int(CorrectionType.COLINEAR)

    results = {}
    for speculate in (True, False):
        eng = HitLSLAM()
        eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
                 constraint_capacity=256)
        eng.speculate = speculate
        eng.add_correction_points(mods, inp.points[0], inp.points[1])
        assert (eng._speculative is None) == (not speculate) or \
            eng._speculative is None   # incomplete selection: no dispatch
        eng.add_correction_points(mods, inp.points[2], inp.points[3])
        if speculate:
            assert eng._speculative is not None
        rep = eng.run()
        assert rep.accepted, rep.reason
        assert eng.speculative_hits == (1 if speculate else 0)
        assert eng._speculative is None    # consumed
        results[speculate] = np.asarray(eng.get_poses())
    np.testing.assert_array_equal(results[True], results[False])


@pytest.mark.full
def test_speculative_dispatch_invalidated_by_state_change(drifted_map):
    """A stale speculative dispatch (poses changed after the selection
    completed) must NOT be consumed."""
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    mods = int(CorrectionType.COLINEAR)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             constraint_capacity=256)
    eng.add_correction_points(mods, inp.points[0], inp.points[1])
    eng.add_correction_points(mods, inp.points[2], inp.points[3])
    assert eng._speculative is not None
    # perturb the state behind the selection's back
    import dataclasses as _dc

    eng.state = _dc.replace(eng.state, poses=eng.state.poses + 0.0)
    rep = eng.run()
    assert rep.accepted, rep.reason
    assert eng.speculative_hits == 0       # stale dispatch not reused


@pytest.mark.full
def test_undo_restores_poses(session, drifted_map):
    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    session.add_correction_points(int(inp.correction_type), inp.points[0], inp.points[1])
    session.add_correction_points(int(inp.correction_type), inp.points[2], inp.points[3])
    before = session.get_poses()
    report = session.run()
    assert report.accepted
    assert not np.allclose(session.get_poses(), before)
    assert session.undo()
    np.testing.assert_allclose(session.get_poses(), before, atol=1e-6)
    # second undo refused (depth 1)
    assert not session.undo()


@pytest.mark.full
def test_undo_after_post_optimize_reverts_refine_only(session, drifted_map):
    """post_optimize has no input-history entry; undo after it must revert
    the REFINE without marking the last human correction undone (review
    finding: the correction was flagged undone while its effects stayed)."""
    m = drifted_map
    inp = _make_correction(m, CorrectionType.COLINEAR)
    session.add_correction_points(int(inp.correction_type), inp.points[0],
                                  inp.points[1])
    session.add_correction_points(int(inp.correction_type), inp.points[2],
                                  inp.points[3])
    rep = session.run()
    assert rep.accepted
    post_cycle = session.get_poses()
    rep2 = session.post_optimize(max_iterations=5)
    assert rep2.accepted
    # 1st undo: reverts the refine, history untouched
    assert session.undo()
    np.testing.assert_allclose(session.get_poses(), post_cycle, atol=1e-6)
    assert session.input_history[-1].undone == 0
    # 2nd undo: now reverts the human correction itself
    assert session.undo()
    assert session.input_history[-1].undone == 1
    # 3rd refused (depth 1)
    assert not session.undo()


@pytest.mark.full
def test_unverified_input_rejected(session):
    bogus = SingleInput(
        CorrectionType.COLINEAR, 0,
        np.array([[500.0, 500.0], [501.0, 500.0], [500.0, 510.0], [501.0, 510.0]],
                 np.float32),
    )
    report = session.replay_log(bogus)
    assert not report.accepted
    assert "not verified" in report.reason


@pytest.mark.full
def test_undo_after_order_rejected_is_pose_noop(drifted_map):
    """The reference snapshots prev_poses_ BEFORE the ordering check
    (HitLSLAM.cpp:390), so undo after a verified-but-order-rejected input
    reverts nothing and merely marks the rejected entry undone (ADVICE r1)."""
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = drifted_map
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=512)
    mods = int(CorrectionType.COLINEAR)

    # a VERIFIED but order-REJECTED input: both selections on the same wall
    # section -> complete observation overlap (EMinput.cpp:377-384)
    base = _make_correction(m, CorrectionType.COLINEAR)
    same = base.points.copy()
    same[2:] = same[:2] + np.float32(0.01)
    poses_before = eng.get_poses()
    eng.add_correction_points(mods, same[0], same[1])
    eng.add_correction_points(mods, same[2], same[3])
    rep = eng.run()
    assert not rep.accepted
    assert "overlap" in rep.reason, rep.reason
    assert len(eng.get_input_history()) == 1   # recorded despite rejection

    # undo is a pose NO-OP (snapshot taken at the rejected input, matching
    # the reference's prev_poses_ snapshot before the ordering check)
    assert eng.undo()
    np.testing.assert_allclose(eng.get_poses(), poses_before, atol=1e-6)
    assert eng.get_input_history()[-1].undone == 1

    # the session still works afterwards: accepted correction, real undo
    good = _make_correction(m, CorrectionType.COLINEAR)
    eng.add_correction_points(mods, good.points[0], good.points[1])
    eng.add_correction_points(mods, good.points[2], good.points[3])
    assert eng.run().accepted
    assert not np.allclose(eng.get_poses(), poses_before)
    assert eng.undo()
    np.testing.assert_allclose(eng.get_poses(), poses_before, atol=1e-6)


@pytest.mark.full
def test_dropped_rows_reported_on_full_table(drifted_map):
    """A too-small constraint table drops pair rows into the dump slot; the
    cycle report must surface the count (r1 weak item: silent truncation)."""
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = drifted_map
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=32)
    rep = eng.replay_log(_make_correction(m, CorrectionType.COLINEAR))
    assert rep.accepted
    assert rep.dropped_rows > 0
    # live rows never exceed capacity-1 (dump slot stays dead)
    assert eng.num_constraints == 31
    t = eng.state.constraints
    assert not bool(np.asarray(t.active)[-1])


@pytest.mark.full
def test_run_queue_matches_sequential_replay(drifted_map):
    """The fused queue chain (cycle.queue_chain via engine.run_queue) must
    reproduce sequential replay_log bit-for-bit: same accept/reject flags,
    same constraint count, identical poses/covariances — including a
    rejected cycle in the middle of the queue and no-op padding (the queue
    is shorter than the chain capacity)."""
    m = drifted_map
    good = _make_correction(m, CorrectionType.COLINEAR)
    # an unverifiable correction (selection far from any observation)
    far = SingleInput(
        CorrectionType.COLINEAR, 0,
        np.array([[90.0, 90.0], [91.0, 90.0],
                  [90.0, 91.0], [91.0, 91.0]], np.float32))
    queue = [good, far, _make_correction(m, CorrectionType.PARALLEL)]

    eng_seq = HitLSLAM()
    eng_seq.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
                 constraint_capacity=1024)
    seq_reports = [eng_seq.replay_log(s) for s in queue]

    eng_q = HitLSLAM()
    eng_q.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
               constraint_capacity=1024)
    q_reports = eng_q.run_queue(queue, record=True)

    assert [r.accepted for r in q_reports] == \
        [r.accepted for r in seq_reports]
    assert q_reports[1].reason.startswith("input not verified")
    for rs, rq in zip(seq_reports, q_reports):
        assert rs.num_new_constraints == rq.num_new_constraints
        assert rs.lm_iterations == rq.lm_iterations
    assert eng_q.num_constraints == eng_seq.num_constraints
    np.testing.assert_array_equal(np.asarray(eng_q.get_poses()),
                                  np.asarray(eng_seq.get_poses()))
    np.testing.assert_array_equal(np.asarray(eng_q.get_covariances()),
                                  np.asarray(eng_seq.get_covariances()))
    # undo restores the pre-queue state (single-depth snapshot covers the
    # whole queue)
    eng_q.undo()
    np.testing.assert_array_equal(np.asarray(eng_q.get_poses()),
                                  np.asarray(m.poses, np.float32))
