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
