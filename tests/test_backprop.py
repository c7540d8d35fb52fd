import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.models.hitl.backprop import (
    DEST_ROT_VARIANCE,
    DEST_TRANS_VARIANCE,
    backprop,
)


def _naive_backprop(poses, covs, correction, bp_min, bp_max):
    """Direct nested-loop transcription of the reference semantics
    (Backprop.cpp:98-210) with the symmetric covariance fix, used as the
    oracle for the scan/prefix-sum implementation."""
    poses = poses.copy().astype(np.float64)
    covs = covs.copy().astype(np.float64)
    destination = poses[bp_max, :2] + correction[:2]

    rot_s = covs[:, 2, 2].copy()
    trans_s = 0.5 * (covs[:, 0, 0] + covs[:, 1, 1])
    sum_rot = rot_s[bp_min : bp_max + 1].sum() + DEST_ROT_VARIANCE
    sum_trans = trans_s[bp_min : bp_max + 1].sum() + DEST_TRANS_VARIANCE
    w_rot = rot_s / sum_rot
    w_trans = trans_s / sum_trans

    rot_beta = 1.0 / (1.0 + rot_s[bp_max - 1] / DEST_ROT_VARIANCE)
    trans_beta = 1.0 / (1.0 + trans_s[bp_max - 1] / DEST_TRANS_VARIANCE)
    for i in range(bp_min, bp_max):
        covs[i, 0:2, 0:2] *= trans_beta
        covs[i, 0:2, 2] *= rot_beta
        covs[i, 2, 0:2] *= rot_beta
        covs[i, 2, 2] *= rot_beta

    theta = correction[2]
    for i in range(bp_min, bp_max):
        dth = w_rot[i] * theta
        c, s = np.cos(dth), np.sin(dth)
        R = np.array([[c, -s], [s, c]])
        center = poses[i, :2].copy()
        poses[i, 2] += dth
        for k in range(i + 1, bp_max + 1):
            poses[k, 2] += dth
            poses[k, :2] = center + R @ (poses[k, :2] - center)

    trans = destination - poses[bp_max, :2]
    for i in range(bp_min, bp_max):
        dt = w_trans[i] * trans
        for k in range(i + 1, bp_max + 1):
            poses[k, :2] += dt
    return poses, covs


def _random_setup(rng, n=40):
    poses = rng.normal(size=(n, 3)).astype(np.float32)
    poses[:, :2] *= 3.0
    covs = np.zeros((n, 3, 3), np.float32)
    for i in range(n):
        a = rng.uniform(0.5, 2.0, 3)
        covs[i] = np.diag([a[0] * 1e-3, a[1] * 1e-3, a[2] * 1e-4])
        covs[i, 0, 2] = covs[i, 2, 0] = 1e-5
    return poses, covs


def test_backprop_matches_naive(rng):
    poses, covs = _random_setup(rng)
    correction = np.array([0.4, -0.3, 0.12], np.float32)
    bp_min, bp_max = 8, 30
    exp_p, exp_c = _naive_backprop(poses, covs, correction, bp_min, bp_max)
    got_p, got_c = backprop(
        jnp.asarray(poses), jnp.asarray(covs), jnp.asarray(correction),
        jnp.asarray(bp_min, jnp.int32), jnp.asarray(bp_max, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got_p), exp_p, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_c), exp_c, atol=1e-6)
    # poses outside the window untouched
    np.testing.assert_array_equal(np.asarray(got_p[:bp_min]), poses[:bp_min])
    np.testing.assert_array_equal(
        np.asarray(got_p[bp_max + 1 :]), poses[bp_max + 1 :]
    )


def test_backprop_noop_cases(rng):
    poses, covs = _random_setup(rng, 10)
    c = np.array([0.1, 0.1, 0.1], np.float32)
    # empty window: bp_min >= bp_max
    got_p, got_c = backprop(
        jnp.asarray(poses), jnp.asarray(covs), jnp.asarray(c),
        jnp.asarray(5, jnp.int32), jnp.asarray(5, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(got_p), poses)
    np.testing.assert_array_equal(np.asarray(got_c), covs)
    # zero correction: poses unchanged (covariances still scale, as in ref)
    got_p, _ = backprop(
        jnp.asarray(poses), jnp.asarray(covs),
        jnp.zeros(3, jnp.float32),
        jnp.asarray(2, jnp.int32), jnp.asarray(8, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got_p), poses, atol=1e-6)
