"""The CPU baseline solver must agree with the device solver — it anchors the
benchmark speedup claim."""

import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.baselines.cpu_lm import cpu_lm_solve
from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
from hitl_slam_tpu.solver import joint as J
from hitl_slam_tpu.solver.lm import LMConfig, solve_jit
import pytest

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def _chain(rng, n):
    p = np.zeros((n, 3), np.float32)
    for i in range(1, n):
        p[i, 2] = p[i - 1, 2] + rng.normal(0, 0.1)
        p[i, :2] = p[i - 1, :2] + [0.4 * np.cos(p[i - 1, 2]),
                                   0.4 * np.sin(p[i - 1, 2])]
    return p


def test_cpu_baseline_matches_device(rng):
    n = 60
    poses = _chain(rng, n)
    np_table = dict(
        ctype=np.array([2, 4, 5], np.int32),
        constrained=np.array([50, 52, 55], np.int32),
        anchor=np.array([3, 4, 5], np.int32),
        dpar=np.array([0.5, 0.2, 0.0], np.float32),
        dperp=np.array([-0.2, 0.4, 0.0], np.float32),
        dth=np.array([0.1, -0.1, 0.2], np.float32),
        pen=np.array([0.0, 0.7, 0.0], np.float32),
        active=np.ones(3, bool),
    )
    t = ConstraintTable.empty(8)
    for k in range(3):
        t = ConstraintTable(
            ctype=t.ctype.at[k].set(int(np_table["ctype"][k])),
            constrained=t.constrained.at[k].set(int(np_table["constrained"][k])),
            anchor=t.anchor.at[k].set(int(np_table["anchor"][k])),
            delta_parallel=t.delta_parallel.at[k].set(float(np_table["dpar"][k])),
            delta_perpendicular=t.delta_perpendicular.at[k].set(
                float(np_table["dperp"][k])),
            delta_angle=t.delta_angle.at[k].set(float(np_table["dth"][k])),
            penalty_dir=t.penalty_dir.at[k].set(float(np_table["pen"][k])),
            active=t.active.at[k].set(True),
        )

    cpu_poses, cpu_cost, cpu_iters = cpu_lm_solve(poses, np_table)
    prob = J.build_problem(jnp.asarray(poses), t)
    dev = solve_jit(prob, jnp.asarray(poses), LMConfig(max_iterations=100))

    assert cpu_iters > 1
    dev_cost = float(dev.final_cost)
    assert abs(dev_cost - cpu_cost) <= 0.02 * max(cpu_cost, 1e-6) + 1e-4, (
        dev_cost, cpu_cost,
    )
    np.testing.assert_allclose(np.asarray(dev.poses), cpu_poses, atol=0.02)
