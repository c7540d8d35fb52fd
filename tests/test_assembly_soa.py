"""SoA normal-equations assembly must reproduce the AoS path exactly
(up to f32 reassociation) — D, U, g, and cost — including the gauge fix
and human factors of every correction type."""

import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
from hitl_slam_tpu.solver import joint as J
from hitl_slam_tpu.solver.assembly_soa import (normal_equations_soa,
                                               soa_constants)
from hitl_slam_tpu.solver.lm import LMConfig, solve_jit
import pytest

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def _chain_poses(rng, n):
    p = np.zeros((n, 3), np.float32)
    for i in range(1, n):
        p[i, 2] = p[i - 1, 2] + rng.normal(0, 0.1)
        step = np.array([np.cos(p[i - 1, 2]), np.sin(p[i - 1, 2])]) * 0.5
        p[i, :2] = p[i - 1, :2] + step + rng.normal(0, 0.02, 2)
    return p


def _mixed_table(rng, P, rows=12):
    t = ConstraintTable.empty(16)
    types = [CorrectionType.LINE_SEGMENT, CorrectionType.COLINEAR,
             CorrectionType.PERPENDICULAR, CorrectionType.PARALLEL,
             CorrectionType.POINT]
    for i in range(rows):
        t = ConstraintTable(
            ctype=t.ctype.at[i].set(int(types[i % len(types)])),
            constrained=t.constrained.at[i].set(int(rng.integers(1, P))),
            anchor=t.anchor.at[i].set(int(rng.integers(0, P))),
            delta_parallel=t.delta_parallel.at[i].set(rng.normal(0, 0.5)),
            delta_perpendicular=t.delta_perpendicular.at[i].set(
                rng.normal(0, 0.5)),
            delta_angle=t.delta_angle.at[i].set(rng.normal(0, 0.2)),
            penalty_dir=t.penalty_dir.at[i].set(rng.normal(0, 1.0)),
            active=t.active.at[i].set(True),
        )
    return t


def test_soa_matches_aos(rng):
    P = 64
    poses0 = jnp.asarray(_chain_poses(rng, P))
    prob = J.build_problem(poses0, _mixed_table(rng, P))
    sc = soa_constants(prob)
    # evaluate away from the build point to exercise every term
    poses = poses0 + jnp.asarray(rng.normal(0, 0.05, (P, 3)).astype(np.float32))

    D_a, U_a, g_a, c_a = J.normal_equations(prob, poses)
    D_s, U_s, g_s, c_s = normal_equations_soa(prob, sc, poses)
    np.testing.assert_allclose(np.asarray(D_s), np.asarray(D_a),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_a),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_a),
                               rtol=2e-5, atol=2e-3)
    np.testing.assert_allclose(float(c_s), float(c_a), rtol=1e-5)
    # gauge block
    np.testing.assert_allclose(np.asarray(D_s[0]), np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.asarray(U_s[0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_s[0]), 0.0, atol=1e-7)


def test_soa_tiny_chain(rng):
    """P=2 edge case: one factor, U has a single (gauge-zeroed) block."""
    poses = jnp.asarray(_chain_poses(rng, 2))
    prob = J.build_problem(poses, ConstraintTable.empty(4))
    sc = soa_constants(prob)
    D_a, U_a, g_a, c_a = J.normal_equations(prob, poses)
    D_s, U_s, g_s, c_s = normal_equations_soa(prob, sc, poses)
    np.testing.assert_allclose(np.asarray(D_s), np.asarray(D_a),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(U_s), np.asarray(U_a),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_a),
                               rtol=1e-5, atol=1e-3)


def test_lm_solve_with_soa_assembly(rng):
    """Full LM through the SoA assembly converges to the same solution."""
    P = 48
    poses = jnp.asarray(_chain_poses(rng, P))
    table = ConstraintTable.empty(8)
    table = ConstraintTable(
        ctype=table.ctype.at[0].set(int(CorrectionType.LINE_SEGMENT)),
        constrained=table.constrained.at[0].set(40),
        anchor=table.anchor.at[0].set(4),
        delta_parallel=table.delta_parallel.at[0].set(1.0),
        delta_perpendicular=table.delta_perpendicular.at[0].set(0.5),
        delta_angle=table.delta_angle.at[0].set(0.1),
        penalty_dir=table.penalty_dir.at[0].set(0.0),
        active=table.active.at[0].set(True),
    )
    prob = J.build_problem(poses, table)
    res_aos = solve_jit(prob, poses, LMConfig(), use_soa=False)
    res_soa = solve_jit(prob, poses, LMConfig(), use_soa=True)
    np.testing.assert_allclose(float(res_soa.final_cost),
                               float(res_aos.final_cost),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_soa.poses),
                               np.asarray(res_aos.poses), atol=5e-3)
