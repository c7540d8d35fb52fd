import jax
import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
from hitl_slam_tpu.ops import residuals as res


def _rand_poses(rng, n):
    p = rng.normal(size=(n, 3)).astype(np.float32)
    p[:, :2] *= 5.0
    return jnp.asarray(p)


def test_odometry_residual_zero_at_build_poses(rng):
    poses = _rand_poses(rng, 12)
    f = res.build_odometry_factors(poses)
    r = res.odometry_residuals(f, poses)
    # f32 roundoff is amplified by 1/sigma (33-100x); 5e-4 ~= eps * |p| / 0.03
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=5e-4)


def test_odometry_jacobian_matches_autodiff(rng):
    poses = _rand_poses(rng, 8)
    f = res.build_odometry_factors(poses)
    # perturb so residuals are nonzero and jacobian is generic
    poses_p = poses + jnp.asarray(rng.normal(size=poses.shape).astype(np.float32)) * 0.1

    J1, J2 = res.odometry_jacobians(f, poses_p)

    def r_fn(flat):
        return res.odometry_residuals(f, flat.reshape(poses_p.shape)).reshape(-1)

    J_full = jax.jit(jax.jacfwd(r_fn))(poses_p.reshape(-1))  # [3F, 3P]
    # analytic == autodiff exactly in f64; at f32 the autodiff path itself
    # carries ~1e-3 relative noise through the scaled rotations, so compare
    # with commensurate tolerances.
    F = poses_p.shape[0] - 1
    for i in range(F):
        rows = slice(3 * i, 3 * i + 3)
        np.testing.assert_allclose(
            np.asarray(J_full[rows, 3 * i : 3 * i + 3]), np.asarray(J1[i]),
            rtol=5e-3, atol=5e-3, err_msg=f"J1 factor {i}",
        )
        np.testing.assert_allclose(
            np.asarray(J_full[rows, 3 * i + 3 : 3 * i + 6]), np.asarray(J2[i]),
            rtol=5e-3, atol=5e-3, err_msg=f"J2 factor {i}",
        )


def _table_with(entries):
    t = ConstraintTable.empty(8)
    for k, (ct, c, a, dpar, dperp, dth, pen) in enumerate(entries):
        t = ConstraintTable(
            ctype=t.ctype.at[k].set(int(ct)),
            constrained=t.constrained.at[k].set(c),
            anchor=t.anchor.at[k].set(a),
            delta_parallel=t.delta_parallel.at[k].set(dpar),
            delta_perpendicular=t.delta_perpendicular.at[k].set(dperp),
            delta_angle=t.delta_angle.at[k].set(dth),
            penalty_dir=t.penalty_dir.at[k].set(pen),
            active=t.active.at[k].set(True),
        )
    return t


def test_human_factors_all_types_match_autodiff(rng):
    poses = _rand_poses(rng, 6)
    table = _table_with([
        (CorrectionType.LINE_SEGMENT, 3, 0, 1.0, -0.5, 0.2, 0.0),
        (CorrectionType.COLINEAR, 4, 1, 0.3, 0.7, -0.1, 0.9),
        (CorrectionType.PERPENDICULAR, 5, 0, 0.0, 0.0, 1.1, 0.0),
        (CorrectionType.PARALLEL, 2, 1, 0.0, 0.0, -0.4, 0.0),
    ])
    f = res.build_human_factors(poses, table)
    poses_p = poses + 0.05 * jnp.asarray(
        rng.normal(size=poses.shape).astype(np.float32))
    r = res.human_residuals(f, poses_p)
    J = res.human_jacobians(f)

    # residual structure: colocation has 3 nonzero rows, colinear 2, angle 1
    assert np.count_nonzero(np.asarray(r[0])) == 3
    assert np.count_nonzero(np.asarray(r[1])) == 2
    assert np.count_nonzero(np.asarray(r[2])) == 1
    assert np.count_nonzero(np.asarray(r[3])) == 1
    # inactive rows are exactly zero
    np.testing.assert_array_equal(np.asarray(r[4:]), 0.0)

    # jacobian vs autodiff, per constrained pose
    for k in range(4):
        c = int(np.asarray(f.pose_idx[k]))

        def rk(q, c=c, k=k):
            ps = poses_p.at[c].set(q)
            return res.human_residuals(f, ps)[k]

        Jk = jax.jacfwd(rk)(poses_p[c])
        np.testing.assert_allclose(np.asarray(Jk), np.asarray(J[k]), atol=1e-5)


def test_human_target_semantics(rng):
    # colocation: residual vanishes when constrained pose sits exactly at
    # anchor + delta in the anchor frame
    poses = _rand_poses(rng, 4)
    dpar, dperp, dth = 0.8, -0.2, 0.3
    table = _table_with([(CorrectionType.LINE_SEGMENT, 2, 1, dpar, dperp, dth, 0.0)])
    f = res.build_human_factors(poses, table)
    a = np.asarray(poses[1])
    ca, sa = np.cos(a[2]), np.sin(a[2])
    target_xy = a[:2] + dpar * np.array([ca, sa]) + dperp * np.array([-sa, ca])
    target_th = np.arctan2(np.sin(a[2] + dth), np.cos(a[2] + dth))
    poses_sat = poses.at[2].set(jnp.asarray([*target_xy, target_th]))
    r = res.human_residuals(f, poses_sat)
    np.testing.assert_allclose(np.asarray(r[0]), 0.0, atol=1e-5)


def test_compact_human_matches_rowwise_assembly(rng):
    """CompactHuman (the O(P)-per-iteration pre-reduction) must equal the
    row-wise [C]-table assembly: Hessian blocks, gradient, and cost."""
    poses0 = _rand_poses(rng, 6)
    table = _table_with([
        (CorrectionType.LINE_SEGMENT, 3, 0, 1.0, -0.5, 0.2, 0.0),
        (CorrectionType.COLINEAR, 4, 1, 0.3, 0.7, -0.1, 0.9),
        (CorrectionType.COLINEAR, 4, 0, -0.2, 0.1, 0.3, -0.4),
        (CorrectionType.PERPENDICULAR, 5, 0, 0.0, 0.0, 1.1, 0.0),
        (CorrectionType.PARALLEL, 2, 1, 0.0, 0.0, -0.4, 0.0),
    ])
    f = res.build_human_factors(poses0, table)
    ch = res.compact_human_factors(f, poses0)

    for step_scale in (0.0, 0.05, 0.5):
        poses = poses0 + step_scale * jnp.asarray(
            rng.normal(size=poses0.shape).astype(np.float32))
        A, g, cost = res.compact_human_terms(ch, poses)

        r = np.asarray(res.human_residuals(f, poses))
        J = np.asarray(res.human_jacobians(f))
        pidx = np.asarray(f.pose_idx)
        H_ref = np.zeros((6, 3, 3), np.float64)
        g_ref = np.zeros((6, 3), np.float64)
        for k in range(len(pidx)):
            H_ref[pidx[k]] += J[k].T @ J[k]
            g_ref[pidx[k]] += J[k].T @ r[k]
        np.testing.assert_allclose(np.asarray(A), H_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=1e-4)
        np.testing.assert_allclose(
            float(cost), 0.5 * float((r * r).sum()), rtol=1e-4, atol=1e-6)

    # onehot reduction path gives the same compact form
    onehot = (np.asarray(f.pose_idx)[:, None] == np.arange(6)[None, :])
    ch2 = res.compact_human_factors(
        f, poses0, jnp.asarray(onehot.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(ch2.A), np.asarray(ch.A), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ch2.c), np.asarray(ch.c), atol=1e-5)
    np.testing.assert_allclose(float(ch2.k), float(ch.k), rtol=1e-5)


def test_relative_pose_constraint_chain(rng):
    """RelativePoseConstraint port (residual_functors.h:944-1035): additive
    prefix-sum chain parameterization; residuals vanish at construction and
    respond to any upstream rel perturbation through the chain."""
    poses = _rand_poses(rng, 8)
    pose0 = jnp.asarray([1, 2, 0], jnp.int32)
    pose1 = jnp.asarray([5, 7, 4], jnp.int32)
    f = res.build_relative_pose_factors(poses, pose0, pose1)

    # recover the additive-rel parameterization of the same poses
    base = poses[0]
    rels = poses[1:] - poses[:-1]
    r = res.relative_pose_residuals(f, base, rels)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-4)

    # perturbing rel[3] moves every pose >=4: factors (1,5), (2,7), (0,4)
    # all respond; a factor fully upstream would not
    rels2 = rels.at[2, 0].add(0.25)   # affects poses >= 3
    r2 = np.asarray(res.relative_pose_residuals(f, base, rels2))
    assert np.abs(r2[0]).max() > 1e-3   # (1,5) straddles pose 3
    assert np.abs(r2[1]).max() > 1e-3   # (2,7) straddles
    assert np.abs(r2[2]).max() > 1e-3   # (0,4) straddles

    rels3 = rels.at[0, 1].add(0.25)    # affects poses >= 1
    r3 = np.asarray(res.relative_pose_residuals(f, base, rels3))
    # both endpoints of (1,5) and (2,7) shift equally -> only frame rotation
    # of the identical translation; factor (0,4) straddles pose 1 -> responds
    assert np.abs(r3[2]).max() > 1e-3

    # the chain Jacobian autodiffs (DynamicAutoDiff analog)
    J = jax.jacfwd(lambda q: res.relative_pose_residuals(f, base, q))(rels)
    assert np.isfinite(np.asarray(J)).all()
    # factor 0 = (1,5): independent of rels beyond pose 5
    assert np.abs(np.asarray(J)[0, :, 5:, :]).max() < 1e-7
