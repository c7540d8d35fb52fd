import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
from hitl_slam_tpu.solver import joint as J
from hitl_slam_tpu.solver.lm import LMConfig, solve_jit


def _chain_poses(rng, n):
    """A drifting chain of poses with small headings."""
    p = np.zeros((n, 3), np.float32)
    for i in range(1, n):
        p[i, 2] = p[i - 1, 2] + rng.normal(0, 0.1)
        step = np.array([np.cos(p[i - 1, 2]), np.sin(p[i - 1, 2])]) * 0.5
        p[i, :2] = p[i - 1, :2] + step + rng.normal(0, 0.02, 2)
    return p


def _one_constraint_table(ctype, c, a, poses, dpar=0.0, dperp=0.0, dth=0.0,
                          pen=0.0):
    t = ConstraintTable.empty(16)
    return ConstraintTable(
        ctype=t.ctype.at[0].set(int(ctype)),
        constrained=t.constrained.at[0].set(c),
        anchor=t.anchor.at[0].set(a),
        delta_parallel=t.delta_parallel.at[0].set(dpar),
        delta_perpendicular=t.delta_perpendicular.at[0].set(dperp),
        delta_angle=t.delta_angle.at[0].set(dth),
        penalty_dir=t.penalty_dir.at[0].set(pen),
        active=t.active.at[0].set(True),
    )


def test_lm_noop_when_consistent(rng):
    """With no human constraints the problem is already at the optimum."""
    poses = jnp.asarray(_chain_poses(rng, 20))
    table = ConstraintTable.empty(8)
    prob = J.build_problem(poses, table)
    res = solve_jit(prob, poses)
    assert float(res.final_cost) <= float(res.initial_cost) + 1e-6
    np.testing.assert_allclose(np.asarray(res.poses), np.asarray(poses),
                               atol=1e-3)


def test_lm_pulls_constrained_pose(rng):
    """A colocation factor pulls the constrained pose toward the target while
    odometry factors distribute the deformation along the chain."""
    poses = jnp.asarray(_chain_poses(rng, 30))
    # demand pose 25 sit 0.5m perpendicular-offset from anchor pose 5's frame
    table = _one_constraint_table(
        CorrectionType.LINE_SEGMENT, 25, 5, poses, dpar=1.0, dperp=0.5, dth=0.1
    )
    prob = J.build_problem(poses, table)
    res = solve_jit(prob, poses)
    assert float(res.final_cost) < float(res.initial_cost)
    # pose 0 is gauge-fixed
    np.testing.assert_allclose(np.asarray(res.poses[0]), np.asarray(poses[0]),
                               atol=1e-7)
    # constrained pose moved
    assert np.linalg.norm(np.asarray(res.poses[25] - poses[25])) > 0.05


@pytest.mark.parametrize("ctype", [
    CorrectionType.LINE_SEGMENT,
    CorrectionType.COLINEAR,
    CorrectionType.PERPENDICULAR,
    CorrectionType.PARALLEL,
])
def test_lm_matches_scipy(rng, ctype):
    """Final cost parity with scipy.optimize.least_squares (the CPU stand-in
    for Ceres) on the same factor graph."""
    from scipy.optimize import least_squares

    poses = jnp.asarray(_chain_poses(rng, 25))
    table = _one_constraint_table(ctype, 20, 4, poses,
                                  dpar=0.8, dperp=0.3, dth=0.15, pen=0.4)
    prob = J.build_problem(poses, table)

    res = solve_jit(prob, poses, LMConfig(max_iterations=200))

    @jax.jit
    def residual_vec(flat):
        p = flat.reshape(poses.shape)
        from hitl_slam_tpu.ops import residuals as R

        r_o = R.odometry_residuals(prob.odom, p)
        r_h = R.human_residuals(prob.human, p)
        return jnp.concatenate([r_o.reshape(-1), r_h.reshape(-1)])

    x0 = np.asarray(poses, np.float64).reshape(-1)

    def f(x):
        # gauge-fix pose 0 by pinning its entries
        x = x.copy()
        x[:3] = x0[:3]
        return np.asarray(residual_vec(jnp.asarray(x, jnp.float32)), np.float64)

    out = least_squares(f, x0, method="trf", xtol=1e-12, ftol=1e-12)
    scipy_cost = 0.5 * float(np.sum(out.fun**2))
    ours = float(res.final_cost)
    assert ours <= scipy_cost * 1.02 + 1e-5, (
        f"{ctype}: ours={ours} scipy={scipy_cost}"
    )
