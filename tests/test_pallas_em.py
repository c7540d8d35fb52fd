"""Pallas EM-sweep kernel vs the XLA reference ops."""

import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.models.hitl import em_input
from hitl_slam_tpu.ops.pallas_em import em_scan
import pytest

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def test_em_scan_matches_xla(rng, small_state):
    st = small_state
    world = st.world_points()
    sel = np.array([[0.0, 0.2], [3.0, 0.1], [-4.0, 0.0], [-1.0, 0.1]],
                   np.float32)
    counts, mind2 = em_scan(world, st.point_mask, jnp.asarray(sel))

    c1, c2 = em_input.observation_counts(world, st.point_mask, jnp.asarray(sel))
    np.testing.assert_array_equal(np.asarray(counts[:, 0]), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(counts[:, 1]), np.asarray(c2))

    near = em_input.verify_input(world, st.point_mask, jnp.asarray(sel))
    np.testing.assert_array_equal(
        np.asarray(mind2) < em_input.VERIFY_THRESHOLD**2, np.asarray(near))


def test_segfit_theta_matches_bruteforce_objective(rng):
    """_segfit_theta's reduced GN converges to the brute-force argmin of the
    exact weighted point-to-segment objective — including END-ZONE inliers,
    whose GN term sign was confirmed flipped in review (points beyond the
    endpoints drove theta AWAY from the minimum)."""

    def objective(theta, pts, w, cm, L):
        a = np.array([np.cos(theta), np.sin(theta)])
        rel = pts - cm
        t = np.clip(rel @ a, -L, L)
        d2 = np.sum((rel - t[:, None] * a[None, :]) ** 2, -1)
        return float(np.sum(w * d2))

    cm = np.zeros(2, np.float32)
    L = 1.0
    cases = []
    # end-zone-dominated: all inliers beyond the two endpoints of a wall
    # rotated +0.03 rad
    th_true = 0.03
    a = np.array([np.cos(th_true), np.sin(th_true)])
    s = np.concatenate([np.linspace(1.05, 1.6, 60),
                        np.linspace(-1.6, -1.05, 60)])
    cases.append((s[:, None] * a[None, :]).astype(np.float32))
    # mixed interior + end-zone
    s2 = np.linspace(-1.5, 1.5, 120)
    cases.append((s2[:, None] * a[None, :]
                  + rng.normal(0, 0.005, (120, 2))).astype(np.float32))
    for pts in cases:
        w = np.ones(len(pts), np.float32)
        got = float(em_input._segfit_theta(
            jnp.asarray(pts), jnp.asarray(w), jnp.asarray(cm),
            jnp.asarray(L, jnp.float32), jnp.asarray(0.0, jnp.float32)))
        grid = np.linspace(-0.3, 0.3, 2001)
        best = grid[np.argmin([objective(t, pts, w, cm, L) for t in grid])]
        assert abs(got - best) < 2e-3, (got, best)
