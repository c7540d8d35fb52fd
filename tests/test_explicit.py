import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.core.state import CorrectionType
from hitl_slam_tpu.models.hitl.explicit import (
    apply_explicit,
    constraint_deltas,
    correction_transform,
)


def _sel(a1, a2, b1, b2):
    return jnp.asarray(np.array([a1, a2, b1, b2], np.float32))


def test_line_to_line_transform():
    # A along +x at y=0, B along +y at x=5: rotation +90deg, cmA -> cmB
    sel = _sel([0, 0], [2, 0], [5, 1], [5, 3])
    th, center, target = correction_transform(
        jnp.asarray(2, jnp.int32), sel
    )
    assert np.isclose(float(th), np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(center), [1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), [5, 2], atol=1e-6)


def test_colinear_projects_center():
    # A parallel to B but offset; colinear: target is cmA projected onto B
    sel = _sel([0, 1], [2, 1], [0, 0], [10, 0])
    th, center, target = correction_transform(jnp.asarray(4, jnp.int32), sel)
    assert np.isclose(float(th), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), [1, 0], atol=1e-6)


def test_perpendicular_angles():
    # A at +45deg vs B at 0deg -> rotate by +45 to reach perpendicular? No:
    # theta_ab=-45; branch: t<0 -> t+pi/2 = +45 rotates A to +90 (perp to B)
    sel = _sel([0, 0], [1, 1], [0, 0], [2, 0])
    th, _, _ = correction_transform(jnp.asarray(5, jnp.int32), sel)
    a_new = np.pi / 4 + float(th)
    assert np.isclose(np.cos(a_new), 0.0, atol=1e-5)  # now perpendicular to B
    # already perpendicular -> no rotation
    sel2 = _sel([0, 0], [0, 2], [0, 0], [2, 0])
    th2, _, _ = correction_transform(jnp.asarray(5, jnp.int32), sel2)
    assert np.isclose(float(th2), 0.0, atol=1e-5)


def test_parallel_rotates_only():
    sel = _sel([0, 0], [1, 1], [5, 5], [7, 5])
    th, center, target = correction_transform(jnp.asarray(6, jnp.int32), sel)
    assert np.isclose(float(th), -np.pi / 4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), np.asarray(center))


def test_apply_explicit_group_and_tail(rng):
    n = 12
    poses = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    sel = _sel([0, 0], [2, 0], [5, 1], [5, 3])  # +90deg, cm (1,0)->(5,2)
    group = np.zeros(n, bool)
    group[4:7] = True
    out, C = apply_explicit(
        poses, jnp.asarray(2, jnp.int32), sel, jnp.asarray(group),
        jnp.asarray(6, jnp.int32),
    )
    out = np.asarray(out)
    p = np.asarray(poses)
    # group poses: exact rigid map p -> target + R(p - center)
    R = np.array([[0.0, -1.0], [1.0, 0.0]])
    for i in range(4, 7):
        np.testing.assert_allclose(
            out[i, :2], np.array([5, 2]) + R @ (p[i, :2] - np.array([1, 0])),
            atol=1e-5,
        )
        assert np.isclose(out[i, 2], p[i, 2] + np.pi / 2, atol=1e-5)
    # poses before the group untouched
    np.testing.assert_array_equal(out[:4], p[:4])
    # tail poses: rigid carry preserves relative offsets to the last group pose
    for k in range(7, n):
        rel_before = p[k, :2] - p[6, :2]
        rel_after = out[k, :2] - out[6, :2]
        np.testing.assert_allclose(rel_after, R @ rel_before, atol=1e-5)
        assert np.isclose(out[k, 2], p[k, 2] + np.pi / 2, atol=1e-5)
    # C is the first group pose's correction
    np.testing.assert_allclose(
        np.asarray(C)[:2],
        np.array([5, 2]) + R @ (p[4, :2] - np.array([1, 0])) - p[4, :2],
        atol=1e-5,
    )
    assert np.isclose(float(C[2]), np.pi / 2, atol=1e-6)


def test_constraint_deltas_roundtrip(rng):
    """delta encoding must reconstruct the constrained pose from the anchor
    (this is what AddHumanConstraints does each solve)."""
    poses = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    sel = _sel([0, 0], [1, 0], [3, 3], [4, 3])
    anchor_idx = jnp.asarray(np.array([1, 2, -1], np.int32))
    corr_idx = jnp.asarray(np.array([5, 6, 7, -1], np.int32))
    dpar, dperp, dth, pen, valid = constraint_deltas(
        poses, sel, anchor_idx, corr_idx
    )
    v = np.asarray(valid)
    assert v[:2, :3].all() and not v[2].any() and not v[:, 3].any()
    p = np.asarray(poses)
    for ai, a in enumerate([1, 2]):
        ca, sa = np.cos(p[a, 2]), np.sin(p[a, 2])
        para, perp = np.array([ca, sa]), np.array([-sa, ca])
        for ci, c in enumerate([5, 6, 7]):
            rec = (
                p[a, :2]
                + float(dpar[ai, ci]) * para
                + float(dperp[ai, ci]) * perp
            )
            np.testing.assert_allclose(rec, p[c, :2], atol=1e-5)
            ang = p[a, 2] + float(dth[ai, ci])
            assert np.isclose(np.cos(ang), np.cos(p[c, 2]), atol=1e-5)
            assert np.isclose(np.sin(ang), np.sin(p[c, 2]), atol=1e-5)


def test_point_correction_transform():
    """POINT (unsupported in the reference): pure translation p -> q."""
    sel = _sel([1, 2], [1, 2], [4, -1], [4, -1])
    theta, center, target = correction_transform(
        jnp.asarray(int(CorrectionType.POINT), jnp.int32), sel)
    assert float(theta) == 0.0
    np.testing.assert_allclose(np.asarray(center), [1, 2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), [4, -1], atol=1e-6)


def test_corner_correction_transform():
    """CORNER: rotate A onto B about the drag-start vertex, vertex -> vertex
    (colocation anchored at the feature corner, not the midpoint)."""
    # corrected drag: vertex (0,0) along +x; anchor: vertex (5,5) along +y
    sel = _sel([0, 0], [2, 0], [5, 5], [5, 7])
    theta, center, target = correction_transform(
        jnp.asarray(int(CorrectionType.CORNER), jnp.int32), sel)
    assert np.isclose(float(theta), np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(center), [0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(target), [5, 5], atol=1e-6)


def test_point_correction_end_to_end():
    """A POINT correction runs through the full fused cycle: colocate one
    drifted lap-2 observation with its lap-1 twin; xy constrained, theta
    free (M = diag(1,1,0))."""
    from hitl_slam_tpu.io.figure8 import generate_figure8, wall_points_drifted
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM
    from hitl_slam_tpu.core.state import SingleInput

    m = generate_figure8(num_poses=128, num_rays=120, seed=7,
                         drift_theta_bias=8e-4, num_laps=2)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=4096)

    # one observed bottom-wall point from each lap (same GT feature area)
    late = wall_points_drifted(m, range(64, 128), 1, 0.0, span=(6.0, 10.0))
    early = wall_points_drifted(m, range(0, 64), 1, 0.0, span=(6.0, 10.0))
    pc = late[np.argmin(np.abs(late[:, 0] - 8.0))]
    pa = early[np.argmin(np.abs(early[:, 0] - pc[0]))]
    sel = np.stack([pc, pa]).astype(np.float32)

    rep = eng.replay_log(SingleInput(CorrectionType.POINT, 0, sel))
    assert rep.accepted, rep.reason
    assert rep.num_new_constraints > 0
    assert np.isfinite(rep.final_cost)
    # the table carries POINT-typed rows
    t = eng.state.constraints
    live = np.asarray(t.active)
    assert (np.asarray(t.ctype)[live] == int(CorrectionType.POINT)).any()


def test_corner_correction_end_to_end():
    """A CORNER correction (vertex-anchored colocation) through the cycle."""
    from hitl_slam_tpu.io.figure8 import generate_figure8, wall_points_drifted
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM
    from hitl_slam_tpu.core.state import SingleInput

    m = generate_figure8(num_poses=128, num_rays=120, seed=7,
                         drift_theta_bias=8e-4, num_laps=2)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=4096)

    # drags along the bottom wall starting near x=5 toward x=9, one per lap
    late = wall_points_drifted(m, range(64, 128), 1, 0.0, span=(5.0, 9.0))
    early = wall_points_drifted(m, range(0, 64), 1, 0.0, span=(5.0, 9.0))

    def drag(pts):
        lo = pts[np.argmin(pts[:, 0])]
        hi = pts[np.argmax(pts[:, 0])]
        return lo, hi

    c0, c1 = drag(late)
    a0, a1 = drag(early)
    sel = np.stack([c0, c1, a0, a1]).astype(np.float32)
    rep = eng.replay_log(SingleInput(CorrectionType.CORNER, 0, sel))
    assert rep.accepted, rep.reason
    assert np.isfinite(rep.final_cost)
    t = eng.state.constraints
    live = np.asarray(t.active)
    assert (np.asarray(t.ctype)[live] == int(CorrectionType.CORNER)).any()
