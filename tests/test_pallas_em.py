"""Pallas EM-sweep kernel vs the XLA reference ops."""

import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.models.hitl import em_input
from hitl_slam_tpu.ops.pallas_em import em_scan


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
