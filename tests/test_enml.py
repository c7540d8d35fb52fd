"""EnML batch localizer + driver tests."""

import numpy as np
import pytest

from hitl_slam_tpu.io.figure8 import generate_raw_stream
from hitl_slam_tpu.models.enml.driver import (

    EpisodeOptions,
    apply_noise_model,
    build_episodes,
    consistency_metric,
    localize_and_save,
)

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def stream():
    return generate_raw_stream(num_steps=160, num_rays=240, seed=11,
                               noise_trans=4e-3, noise_theta=2e-3)


@pytest.fixture(scope="module")
def episodes(stream):
    scans, angles, rel, gt, walls = stream
    return build_episodes(scans, angles, rel,
                          EpisodeOptions(clip_low=10, clip_high=10))


def test_build_episodes_gating(stream, episodes):
    scans, angles, rel, gt, walls = stream
    poses, pcs, ncs, rels = episodes
    # node gating prunes scans where the robot barely moved
    assert 10 < len(poses) < len(scans)
    assert len(pcs) == len(poses) == len(ncs) == len(rels)
    for pc, nc in zip(pcs, ncs):
        assert pc.shape == nc.shape
        np.testing.assert_allclose(np.linalg.norm(nc, axis=1), 1.0, atol=1e-5)
    # odometry integration consistent: integrating rels reproduces poses
    t = np.zeros(2)
    th = 0.0
    for k in range(len(poses)):
        c, s = np.cos(th), np.sin(th)
        t = np.array([[c, -s], [s, c]]) @ rels[k, :2] + t
        th = th + rels[k, 2]
        np.testing.assert_allclose(poses[k, :2], t, atol=1e-4)


def test_apply_noise_model_statistics(rng):
    outs = np.array([apply_noise_model(0.3, 0.1, 0.05, 0.05, rng)
                     for _ in range(400)])
    # unbiased around the true motion, nonzero spread
    np.testing.assert_allclose(outs.mean(0), [0.3, 0.1, 0.05], atol=0.02)
    assert (outs.std(0) > 1e-4).all()
    # zero noise factor -> exact passthrough
    exact = apply_noise_model(0.3, 0.1, 0.05, 0.0, rng)
    np.testing.assert_allclose(exact, [0.3, 0.1, 0.05], atol=1e-6)


def test_batch_localize_improves_consistency(episodes, tmp_path):
    poses, pcs, ncs, rels = episodes
    new_poses, covs = localize_and_save(
        poses, pcs, ncs, str(tmp_path / "enml_out"), map_name="TestEnML")

    assert new_poses.shape == poses.shape
    assert np.isfinite(new_poses).all()
    assert np.isfinite(covs).all()
    # covariances: symmetric PSD with broadly growing scale along trajectory
    for i in range(1, len(covs)):
        np.testing.assert_allclose(covs[i], covs[i].T, atol=1e-5)
        eig = np.linalg.eigvalsh(covs[i])
        assert (eig > -1e-7).all(), i
    early = np.trace(covs[1:9].mean(0))
    late = np.trace(covs[-8:].mean(0))
    assert late > early

    before = consistency_metric(poses, pcs)
    after = consistency_metric(new_poses, pcs)
    assert after <= before * 1.05, (before, after)

    # output is loadable and feeds the HitL engine
    from hitl_slam_tpu.io import stfs

    data = stfs.load_stfs_covars(str(tmp_path / "enml_out.stfs.covars"))
    assert data.poses.shape == new_poses.shape
    np.testing.assert_allclose(data.poses, new_poses, atol=2e-3)


def test_online_localizer(stream):
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.online import OnlineLocalizer

    scans, angles, rel, gt, walls = stream
    loc = OnlineLocalizer(
        EpisodeOptions(clip_low=10, clip_high=10),
        EnmlOptions(max_history=6, gn_iterations=4, match_rounds=1),
    )
    loc.start()
    try:
        for i in range(60):
            loc.odometry_update(*[float(v) for v in rel[i]])
            loc.sensor_update(scans[i], angles)
        loc.drain(timeout=120.0)
        assert loc.node_count() > 5
        p = loc.pose()
        assert np.isfinite(p).all()
        # online estimate should track ground truth to within drift scale;
        # compare in gt[0]'s frame (odometry can't know the absolute start)
        c, s = np.cos(-gt[0][2]), np.sin(-gt[0][2])
        gt_rel = np.array([[c, -s], [s, c]]) @ (gt[59][:2] - gt[0][:2])
        assert np.linalg.norm(p[:2] - gt_rel) < 2.0
    finally:
        loc.stop()


def test_cli_enml_online_mode(tmp_path):
    """--online replays the stream through the producer/consumer localizer
    (the reference's SensorUpdate/OdometryUpdate deployment path) and saves
    the live trajectory (.poses + covariance-free .stfs)."""
    from hitl_slam_tpu import cli_enml

    out = str(tmp_path / "live")
    rc = cli_enml.main(["--synthetic", "--steps", "48", "--online",
                        "-o", out, "--max-history", "6"])
    assert rc == 0
    poses = np.loadtxt(out + ".poses")
    assert poses.ndim == 2 and poses.shape[1] == 3 and len(poses) > 5
    assert np.isfinite(poses).all()
    lines = open(out + ".stfs").read().splitlines()
    assert lines[0] == "EnML" and len(lines) > 10 * len(poses)
    # incompatible-mode guard
    import pytest as _pt

    with _pt.raises(SystemExit, match="incompatible"):
        cli_enml.main(["--synthetic", "--steps", "8", "--online",
                       "--parallel-windows", "-o", out])


def test_engine_cost_breakdown(episodes):
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    poses, pcs, ncs, rels = episodes
    eng = HitLSLAM()
    eng.init(poses, np.tile(np.eye(3, dtype=np.float32) * 1e-4,
                            (len(poses), 1, 1)), pcs, ncs,
             constraint_capacity=64)
    bd = eng.get_cost_breakdown()
    assert bd["num_active_constraints"] == 0
    assert bd["human_cost"] == 0.0
    assert bd["odometry_cost"] < 1e-3  # targets built from current poses


def test_keyframes_and_corrections_and_artifacts(stream, tmp_path):
    from hitl_slam_tpu.io import stfs as stfs_io
    from hitl_slam_tpu.models.enml.driver import consistency_image

    scans, angles, rel, gt, walls = stream
    # keyframes force nodes even with a huge gating threshold
    opts = EpisodeOptions(minimum_node_translation=1e9,
                          minimum_node_rotation=1e9,
                          clip_low=10, clip_high=10)
    poses, pcs, _, rels = build_episodes(scans[:40], angles, rel[:40], opts,
                                         keyframes={0, 10, 20})
    assert len(poses) == 3
    # laser corrections scale ranges
    corr = np.full(64, 2.0, np.float32)
    poses2, pcs2, _, _ = build_episodes(scans[:1], angles, rel[:1],
                                        EpisodeOptions(clip_low=10, clip_high=10),
                                        laser_corrections=corr)
    poses3, pcs3, _, _ = build_episodes(scans[:1], angles, rel[:1],
                                        EpisodeOptions(clip_low=10, clip_high=10))
    assert np.linalg.norm(pcs2[0], axis=1).mean() > 1.5 * np.linalg.norm(
        pcs3[0], axis=1).mean()
    # odometry + stfs (no covars) writers
    stfs_io.save_odometry(str(tmp_path / "Odom.txt"), rels)
    assert len(np.loadtxt(str(tmp_path / "Odom.txt"))) == len(rels)
    stfs_io.save_stfs(str(tmp_path / "m.stfs"), "M", 0.0, poses, pcs)
    lines = open(tmp_path / "m.stfs").read().splitlines()
    assert len(lines) == 2 + sum(len(p) for p in pcs)
    # consistency image artifact
    img = consistency_image(poses, pcs, str(tmp_path / "cons.png"))
    assert img.shape == (3, 3)
    with open(tmp_path / "cons.png", "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


@pytest.fixture(scope="module")
def small_episode_state(stream):
    from hitl_slam_tpu.core.state import make_map_state

    scans, angles, rel, gt, walls = stream
    poses, pcs, ncs, rels = build_episodes(
        scans[:80], angles, rel[:80],
        EpisodeOptions(clip_low=10, clip_high=10))
    st = make_map_state(poses, np.zeros((len(poses), 3, 3), np.float32),
                        pcs, ncs)
    return st, poses, pcs


def test_checkerboard_localize_matches_sequential(small_episode_state):
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions, batch_localize
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        checkerboard_localize)

    st, poses0, pcs = small_episode_state
    o = EnmlOptions()
    sp, sc = batch_localize(st.points, st.normals, st.point_mask, st.poses, o)
    pp, pc = checkerboard_localize(st.points, st.normals, st.point_mask,
                                   st.poses, o)
    pp, sp = np.asarray(pp), np.asarray(sp)
    assert np.isfinite(pp).all() and np.isfinite(np.asarray(pc)).all()
    # both solvers register the same factors; solutions agree to ~decimeter
    assert np.abs(pp[:, :2] - sp[:, :2]).max() < 0.2, \
        np.abs(pp - sp).max()
    # the checkerboard result is at least as consistent as the input
    before = consistency_metric(poses0, pcs)
    after = consistency_metric(pp, pcs)
    assert after <= before * 1.02, (before, after)
    # covariances: symmetric, PSD, pose 0 is the gauge
    covs = np.asarray(pc)
    for i in range(len(covs)):
        np.testing.assert_allclose(covs[i], covs[i].T, atol=1e-5)
        assert (np.linalg.eigvalsh(covs[i]) > -1e-6).all(), i
    # window-FIRST poses (multiples of W) must carry real marginals, not
    # the pinned-identity block (review finding r3: the even tiling pins
    # its first pose; those rows come from the odd-tiling eval pass)
    W = min(EnmlOptions().max_history, len(covs))
    seq_covs = np.asarray(sc)
    for i in range(W, len(covs), W):
        assert np.trace(covs[i]) < 0.5, (i, np.trace(covs[i]))
        assert np.trace(covs[i]) < 50 * max(np.trace(seq_covs[i]), 1e-9), i


def test_checkerboard_grid_matcher_path(small_episode_state):
    """force_grid exercises the grid-hash window matcher (the max_history=80
    configuration path) at test-friendly sizes."""
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        checkerboard_localize)

    st, poses0, pcs = small_episode_state
    o = EnmlOptions(gn_iterations=6, match_rounds=1)
    pb, cb = checkerboard_localize(st.points, st.normals, st.point_mask,
                                   st.poses, o, n_passes=1)
    pg, cg = checkerboard_localize(st.points, st.normals, st.point_mask,
                                   st.poses, o, n_passes=1, force_grid=True)
    pb, pg = np.asarray(pb), np.asarray(pg)
    assert np.isfinite(pg).all()
    # grid matcher finds (nearly) the same NNs as the brute matcher
    assert np.abs(pb - pg).max() < 0.05, np.abs(pb - pg).max()
    # the grid path's SPLIT covariance pass (sequential matches + batched
    # Hessian eval, r5) must agree with the brute path's marginals —
    # covers eval_chunk_split numerically, not just for shape
    cb, cg = np.asarray(cb), np.asarray(cg)
    assert np.isfinite(cg).all()
    scale = np.maximum(np.abs(cb).max(axis=(1, 2), keepdims=True), 1e-9)
    assert (np.abs(cg - cb) / scale).max() < 0.2, \
        (np.abs(cg - cb) / scale).max()


def test_gn_unroll_matches_full_unroll(small_episode_state):
    """gn_unroll=k (fori_loop codegen, compile O(k) instead of
    O(gn_iterations)) computes the same sweep as the fully-unrolled
    default — same math, different loop lowering."""
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions, batch_localize

    st, poses0, pcs = small_episode_state
    o_full = EnmlOptions(gn_iterations=6, match_rounds=1)
    o_capped = EnmlOptions(gn_iterations=6, match_rounds=1, gn_unroll=2)
    pf, cf = batch_localize(st.points, st.normals, st.point_mask,
                            st.poses, o_full)
    pc_, cc = batch_localize(st.points, st.normals, st.point_mask,
                             st.poses, o_capped)
    pf, pc_ = np.asarray(pf), np.asarray(pc_)
    assert np.isfinite(pc_).all()
    np.testing.assert_allclose(pc_, pf, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cc), np.asarray(cf), atol=1e-4)


def test_checkerboard_match_capacity_probe(small_episode_state):
    """probe_match_capacity surfaces grid-matcher capacity violations
    (ADVICE r2): zero dropped on the shipped config-scale windows."""
    import jax.numpy as jnp

    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        probe_match_capacity)

    st, poses0, pcs = small_episode_state
    o = EnmlOptions(gn_iterations=1, match_rounds=1)
    assert int(probe_match_capacity(
        st.points, st.normals, st.point_mask, st.poses, o)) == 0
    # a pathological density (every point in one cell) must be DETECTED:
    # collapse all points to the origin
    dense = jnp.zeros_like(st.points)
    assert int(probe_match_capacity(
        dense, st.normals, st.point_mask, st.poses, o)) > 0


def test_checkerboard_chunk_clamp_equivalence(small_episode_state):
    """A chunk wider than the parity's window count must produce the same
    sweep as a fitting chunk (the clamp only removes padding-window work —
    r5: unclamped, a 2-window parity under chunk=8 computed 6 fully-masked
    window solves per pass at full cost)."""
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        checkerboard_localize)

    st, poses0, pcs = small_episode_state
    o = EnmlOptions(gn_iterations=4, match_rounds=1)
    for fg in (False, True):   # brute AND split-grid chunk drivers
        p_small, c_small = checkerboard_localize(
            st.points, st.normals, st.point_mask, st.poses, o, chunk=2,
            force_grid=fg)
        p_wide, c_wide = checkerboard_localize(
            st.points, st.normals, st.point_mask, st.poses, o, chunk=64,
            force_grid=fg)
        np.testing.assert_allclose(np.asarray(p_wide), np.asarray(p_small),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_wide), np.asarray(c_small),
                                   atol=1e-4)
