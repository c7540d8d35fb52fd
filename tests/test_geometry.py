import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.ops import geometry as geo


def test_angle_mod_wraps():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 5 * np.pi, -7.5])
    w = geo.angle_mod(a)
    np.testing.assert_allclose(np.cos(w), np.cos(a), atol=1e-6)
    np.testing.assert_allclose(np.sin(w), np.sin(a), atol=1e-6)
    assert np.all(np.abs(np.asarray(w)) <= np.pi + 1e-6)


def test_rotate_matches_matrix(rng):
    theta = rng.normal(size=(5,)).astype(np.float32)
    v = rng.normal(size=(5, 2)).astype(np.float32)
    out = geo.rotate(jnp.asarray(theta), jnp.asarray(v))
    R = np.asarray(geo.rot2(jnp.asarray(theta)))
    expected = np.einsum("nij,nj->ni", R, v)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_pose_roundtrip(rng):
    pose = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(7, 2)).astype(np.float32))
    w = geo.pose_to_world(pose, pts)
    back = geo.world_to_robot(pose, w)
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_dist_to_segment_regions():
    p1 = jnp.array([0.0, 0.0])
    p2 = jnp.array([2.0, 0.0])
    pts = jnp.array([[1.0, 1.0], [-1.0, 0.0], [3.0, 0.0], [1.0, 0.0]])
    d = geo.dist_to_segment(p1, p2, pts)
    np.testing.assert_allclose(d, [1.0, 1.0, 1.0, 0.0], atol=1e-6)


def test_generate_normals_interior_and_mask():
    # straight horizontal scan: normals should be (0, 1) or (0, -1)
    n = 16
    pts = jnp.stack([jnp.linspace(0, 1.5, n), jnp.zeros(n)], axis=-1)
    mask = jnp.ones(n, bool)
    normals, new_mask = geo.generate_normals(pts, mask, max_neighbor_dist=0.5)
    assert bool(new_mask.all())
    np.testing.assert_allclose(np.abs(np.asarray(normals)[:, 1]), 1.0, atol=1e-6)

    # isolated point (neighbors too far) gets masked out
    pts2 = jnp.array([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
    _, m2 = geo.generate_normals(pts2, jnp.ones(3, bool), max_neighbor_dist=0.5)
    assert not bool(m2.any())
