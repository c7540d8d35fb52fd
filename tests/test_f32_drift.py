"""f32-vs-f64 divergence bounds at reference scale (VERDICT r2 item 6).

The TPU path is all-f32 (f64 is emulated and unusably slow on this TPU,
CLAUDE.md); Ceres runs in doubles (JointOptimization.cpp:1090-1093). These
tests put a MEASURED number on the gap at scale:

  - a multi-correction session at 4096 poses: after each accepted cycle,
    the identical pre-solve state + constraint table re-solves through
    baselines/cpu_lm.py (f64 LAPACK banded Cholesky); pose-wise divergence
    measured 3.0e-5 m / 2.2e-6 rad worst-case (12,288 active constraint
    rows) — asserted < 5e-4 m / 5e-5 rad (>10x headroom);
  - EnML window-Hessian covariances (the f32 inverse DEVIATIONS #8 flags
    as fragile): f32 path vs an independent f64 NumPy mirror.
"""

import numpy as np
import pytest

from hitl_slam_tpu.core.state import CorrectionType, SingleInput

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def test_session_f32_vs_f64_divergence_4096_poses():
    from hitl_slam_tpu.baselines.cpu_lm import cpu_lm_solve
    from hitl_slam_tpu.io.figure8 import (generate_figure8,
                                          synthesize_correction)
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    P = 4096
    m = generate_figure8(num_poses=P, num_rays=40, seed=13,
                         drift_theta_bias=3e-5, num_laps=2)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             constraint_capacity=16384)
    specs = [
        (range(P - 1200, P - 160), range(160, 1200), (1, 0.0), (1, 0.0)),
        (range(3072, 4000), range(1024, 2000), (0, -20.0), (0, -20.0)),
        (range(P // 2 + 80, P - 80), range(80, P // 2 - 80), (1, 10.0),
         (1, 10.0)),
        (range(2100, 2700), range(60, 800), (0, 20.0), (0, 20.0)),
    ]
    accepted = 0
    for cr, ar, cw, aw in specs:
        try:
            sel = synthesize_correction(m, cr, ar, cw, aw, min_points=30,
                                        poses=eng.get_poses())
        except ValueError:
            continue
        rep = eng.replay_log(SingleInput(CorrectionType.COLINEAR, 0, sel))
        if not rep.accepted:
            continue
        accepted += 1
        # identical inputs: the cycle's pre-solve poses + the full table
        pre = np.asarray(eng.last_pre_solve_poses)
        t = eng.state.constraints
        act = np.asarray(t.active)
        table = dict(ctype=np.asarray(t.ctype)[act],
                     constrained=np.asarray(t.constrained)[act],
                     anchor=np.asarray(t.anchor)[act],
                     dpar=np.asarray(t.delta_parallel)[act],
                     dperp=np.asarray(t.delta_perpendicular)[act],
                     dth=np.asarray(t.delta_angle)[act],
                     pen=np.asarray(t.penalty_dir)[act],
                     active=np.ones(int(act.sum()), bool))
        f64_poses, f64_cost, _it = cpu_lm_solve(pre, table)
        got = np.asarray(eng.get_poses())
        dxy = np.linalg.norm(got[:, :2] - f64_poses[:, :2], axis=1)
        dth = np.abs(np.arctan2(np.sin(got[:, 2] - f64_poses[:, 2]),
                                np.cos(got[:, 2] - f64_poses[:, 2])))
        # Two bounds, mirroring the acceptance criterion (BASELINE.md:
        # matched final cost):
        # 1. COST PARITY — the device's answer, evaluated under the f64
        #    mirror's own cost, must match the mirror's optimum. Measured
        #    worst case 5.6e-5 relative (correction 3).
        # 2. POSE proximity — loose: since the r4 rejected-step termination
        #    (DEVIATIONS #22) the two solvers stop at different points of
        #    the same flat valley (measured 2.0e-3 m at 12k rows with cost
        #    parity intact; pre-r4 identical-trajectory worst case was
        #    3.0e-5 m). A genuinely wrong solve breaks both bounds.
        from hitl_slam_tpu.baselines import cpu_lm as c64

        ax64, d64, rot64 = c64.build_odometry_factors_np(pre)
        hidx, hM, ht = c64.build_human_factors_np(pre, table)
        isg = (1.0 / 0.03, 1.0 / 0.03, 1.0 / 0.01)
        r_o = c64.odometry_residuals_jacobians_np(
            ax64, d64, rot64, got.astype(np.float64), isg)[0]
        r_h = np.einsum("cij,cj->ci", hM,
                        ht - got.astype(np.float64)[hidx])
        dev_cost = 0.5 * (np.sum(r_o**2) + np.sum(r_h**2))
        assert dev_cost - f64_cost <= max(2e-4 * f64_cost, 1e-8), (
            accepted, float(dev_cost), float(f64_cost))
        assert dxy.max() < 5e-3, (accepted, float(dxy.max()))
        assert dth.max() < 5e-4, (accepted, float(dth.max()))
    assert accepted >= 3   # the divergence bound covers a real session


def test_enml_window_covariances_f32_vs_f64():
    """window_covariances (f32 Hessian inverse on device) vs an independent
    f64 NumPy mirror on a REAL window Hessian."""
    import jax.numpy as jnp

    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_raw_stream
    from hitl_slam_tpu.models.enml.driver import (EpisodeOptions,
                                                  build_episodes)
    from hitl_slam_tpu.models.enml.localizer import (EnmlOptions,
                                                     _odometry_targets,
                                                     _window_gn)
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        window_covariances)

    scans, angles, rel, gt, walls = generate_raw_stream(
        num_steps=60, num_rays=120, seed=4)
    poses, pcs, ncs, rels = build_episodes(
        scans, angles, rel, EpisodeOptions(clip_low=10, clip_high=10))
    st = make_map_state(poses, np.zeros((len(poses), 3, 3), np.float32),
                        pcs, ncs)
    o = EnmlOptions(gn_iterations=4, match_rounds=1)
    W = min(10, st.num_poses)
    axis, d, rot, isig = _odometry_targets(st.poses, o)
    idx = np.arange(W)
    new_poses, H = _window_gn(
        st.poses[:W], st.points[:W], st.normals[:W], st.point_mask[:W],
        axis[: W - 1], d[: W - 1], rot[: W - 1], isig[: W - 1],
        jnp.ones(W - 1, jnp.float32), o)
    active = jnp.ones(W, bool)
    covs32 = np.asarray(window_covariances(H, active, new_poses[:, 2]))

    # independent f64 mirror of the same math
    H64 = np.asarray(H, np.float64) + np.eye(3 * W) * 1e-9
    cov_full = np.linalg.inv(H64)
    th = np.asarray(new_poses[:, 2], np.float64)
    covs64 = np.zeros((W, 3, 3))
    for j in range(W):
        b = cov_full[3 * j: 3 * j + 3, 3 * j: 3 * j + 3]
        c, s = np.cos(-th[j]), np.sin(-th[j])
        T = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        covs64[j] = T @ b @ T.T
    scale = np.abs(covs64).max(axis=(1, 2), keepdims=True)
    rel = np.abs(covs32 - covs64) / np.maximum(scale, 1e-12)
    # measured and documented: the f32 inverse tracks f64 to ~1e-3 of each
    # block's magnitude on conditioned window Hessians
    assert float(rel.max()) < 5e-3, float(rel.max())
