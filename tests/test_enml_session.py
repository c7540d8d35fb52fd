"""Interactive EnML session tests: segmented sweep, covariance-weighted
loop corrections (AddLoopConstraint), log/replay (ReplayLog), and the live
GUI protocol (LoopCloseCallback + DrawPoses/DrawStfs publishes)."""

import json
import time

import numpy as np
import pytest

from hitl_slam_tpu.core.state import CorrectionType
from hitl_slam_tpu.io.figure8 import generate_figure8, synthesize_correction
from hitl_slam_tpu.models.enml.localizer import EnmlOptions
from hitl_slam_tpu.models.enml.session import EnmlSession, loop_inv_sigmas

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full

OPTS = EnmlOptions(max_history=8, gn_iterations=6)


@pytest.fixture(scope="module")
def drifted_map():
    return generate_figure8(num_poses=96, num_rays=120, seed=5,
                            drift_theta_bias=8e-4)


@pytest.fixture(scope="module")
def clouds(drifted_map):
    m = drifted_map
    return ([np.asarray(p) for p in m.point_clouds],
            [np.asarray(n) for n in m.normal_clouds])


def test_segmented_sweep_matches_fused(drifted_map, clouds):
    """sweep_segment tiled over [0, P) reproduces the fused batch_localize
    scan exactly (same step body, same window math)."""
    import jax.numpy as jnp

    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.models.enml.localizer import (
        batch_localize, sweep_precompute, sweep_segment)

    m = drifted_map
    pcs, ncs = clouds
    st = make_map_state(m.poses, np.zeros((len(m.poses), 3, 3), np.float32),
                        pcs, ncs)
    p_full, c_full = batch_localize(st.points, st.normals, st.point_mask,
                                    st.poses, OPTS)
    P = st.poses.shape[0]
    pre = sweep_precompute(st.poses, OPTS)
    ps, cv = st.poses, jnp.zeros((P, 3, 3), st.poses.dtype)
    S = 40                      # deliberately not a divisor of P=96
    for t0 in range(0, P, S):
        ps, cv = sweep_segment(st.points, st.normals, st.point_mask, ps, cv,
                               pre, jnp.asarray(t0, jnp.int32), OPTS, S)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(p_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cv)[1:], np.asarray(c_full)[1:],
                               atol=1e-4)


def test_loop_inv_sigmas_reference_math(drifted_map, clouds):
    """Vectorized loop_inv_sigmas == a direct scalar transcription of
    AddLoopConstraint's per-factor noise model (vector_mapping.cpp:464-556)
    on a random instance."""
    rng = np.random.default_rng(3)
    P = 12
    poses = rng.normal(size=(P, 3)).astype(np.float32)
    A = rng.normal(size=(P, 3, 3)) * 0.05
    covs = (A @ np.swapaxes(A, -1, -2)).astype(np.float32)  # PSD

    o = OPTS
    got = loop_inv_sigmas(poses, covs, o, scale=2.0)
    assert got.shape == (P - 1, 3)

    for i in range(1, P):
        t = poses[i, :2] - poses[i - 1, :2]
        if abs(t[0]) < 1e-6 and abs(t[1]) < 1e-6:
            radial = np.array([np.cos(poses[i, 2]), np.sin(poses[i, 2])])
        else:
            c, s = np.cos(-poses[i - 1, 2]), np.sin(-poses[i - 1, 2])
            radial = np.array([c * t[0] - s * t[1], s * t[0] + c * t[1]])
            radial /= np.linalg.norm(radial)
        cov2 = covs[i - 1][:2, :2].astype(np.float64)
        w, v = np.linalg.eigh(0.5 * (cov2 + cov2.T))
        d1 = v[:, 0] * np.sqrt(5.991 * max(w[0], 0.0))
        d2 = v[:, 1] * np.sqrt(5.991 * max(w[1], 0.0))
        r_std = np.sqrt(radial.dot(d1) ** 2 + radial.dot(d2) ** 2)
        a_std = np.sqrt(max(covs[i - 1][2, 2], 0.0))
        r_std = np.clip(r_std, o.odometry_translation_min_stddev,
                        o.odometry_translation_max_stddev)
        a_std = np.clip(a_std, o.odometry_angular_min_stddev,
                        o.odometry_angular_max_stddev)
        want = 1.0 / (2.0 * np.array([r_std, r_std, a_std]))
        np.testing.assert_allclose(got[i - 1], want, rtol=1e-4)


def test_session_correct_log_replay(drifted_map, clouds, tmp_path):
    """Full interactive workflow: segmented localize with a correction
    QUEUED mid-run (applied at a segment boundary), plus one post-batch
    correction; a fresh session replaying the log reproduces the poses."""
    m = drifted_map
    pcs, ncs = clouds
    sess = EnmlSession(m.poses, pcs, ncs, options=OPTS)

    boundaries = []
    sess.localize(segment=32, progress_cb=lambda s, t: boundaries.append(t))
    assert boundaries == [32, 64, 96]
    covs = sess.covariances
    # covariances grow along the trajectory (gauge pose 0 is ~zero)
    assert covs[60, 0, 0] > covs[5, 0, 0] > 0

    sel = synthesize_correction(m, range(60, 96), range(0, 30), (1, 0.0),
                                (1, 0.0), poses=sess.poses)
    rep = sess.add_loop_correction(CorrectionType.COLINEAR, sel)
    assert rep.accepted and rep.new_constraints > 0
    corrected = sess.poses.copy()

    # STF correspondences exist on the localized map (DrawStfs feed)
    src, tgt = sess.correspondences()
    assert len(src) > 10 and src.shape == tgt.shape

    log = str(tmp_path / "session.log")
    sess.save_log(log)

    # fresh session: queue the same correction BEFORE localizing — it must
    # splice in at a segment boundary and still be logged/replayable
    sess2 = EnmlSession(m.poses, pcs, ncs, options=OPTS)
    n = sess2.load_log(log)
    assert n == 1
    sess2.localize(segment=32)
    reps = sess2.replay_all()
    assert [r.accepted for r in reps] == [True]
    # log round-trips clicks as text: sub-mm replay agreement
    np.testing.assert_allclose(sess2.poses, corrected, atol=2e-3)

    # queued-mid-run path: correction applied at a boundary, same outcome
    sess3 = EnmlSession(m.poses, pcs, ncs, options=OPTS)
    sess3.queue_correction(CorrectionType.COLINEAR, sel)
    sess3.localize(segment=128)      # one segment: applies after the sweep
    assert len(sess3.input_history) == 1
    np.testing.assert_allclose(sess3.poses, corrected, atol=2e-3)


def _rot(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s], [s, c]])


def _seg_dist(a, b, pts):
    ab = b - a
    t = np.clip(((pts - a) @ ab) / max(ab @ ab, 1e-12), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.linalg.norm(pts - proj, axis=1)


def _synth_wall_correction(poses, pcs, walls, late, early,
                           capture=0.35, min_pts=40):
    """[4,2] correction selection from a localized map: the wall both pose
    ranges observe best, with the LATE range's observed segment first
    (corrected) and the EARLY range's second (anchor)."""
    from hitl_slam_tpu.io.figure8 import fit_clicked_segment

    def range_pts_near(idx, wall):
        a, b = np.asarray(wall[:2]), np.asarray(wall[2:])
        out = []
        for i in idx:
            w = pcs[i] @ _rot(poses[i, 2]).T + poses[i, :2]
            d = _seg_dist(a, b, w)
            out.append(w[d < capture])
        return np.concatenate(out) if out else np.zeros((0, 2))

    best, best_n = None, -1
    for wall in walls:
        lp = range_pts_near(late, wall)
        ep = range_pts_near(early, wall)
        n = min(len(lp), len(ep))
        if n > best_n:
            best, best_n = (lp, ep), n
    lp, ep = best
    assert best_n >= min_pts, f"only {best_n} shared wall points"
    return np.concatenate([fit_clicked_segment(lp),
                           fit_clicked_segment(ep)], axis=0)


def test_enml_gui_protocol(tmp_path):
    """Headless websocket client drives the EnML live tool end to end:
    progress frames stream during batch localization, the 0x06 toggle
    enables loop corrections (LoopCloseCallback :2753), two COLINEAR drags
    apply a correction to the live map, 'v' saves, and the correction log
    is written on shutdown."""
    import asyncio
    import threading

    import websockets

    from hitl_slam_tpu import cli_enml
    from hitl_slam_tpu.io import stfs as stfs_mod
    from hitl_slam_tpu.io.figure8 import generate_raw_stream
    from hitl_slam_tpu.models.enml.driver import EpisodeOptions, build_episodes

    out = str(tmp_path / "gui_out")
    port = 8794

    # in-process mirror of the CLI's run (same shapes/options -> the CLI
    # thread reuses this jit cache) to synthesize a valid loop-closure
    # selection against the map the CLI will actually produce
    scans, angles, rel, gt, walls = generate_raw_stream(num_steps=96, seed=5)
    poses0, pcs, ncs, _ = build_episodes(
        list(scans), angles, rel, EpisodeOptions(clip_low=10, clip_high=10))
    mirror = EnmlSession(poses0, pcs, ncs, options=OPTS)
    mirror.localize(segment=32)
    P = len(mirror.poses)
    sel = _synth_wall_correction(mirror.poses, pcs, walls,
                                 late=range(P - 30, P), early=range(0, 25))
    rep = mirror.add_loop_correction(CorrectionType.COLINEAR, sel)
    assert rep.accepted     # the selection is valid on this map

    rc = {}
    t = threading.Thread(
        target=lambda: rc.update(code=cli_enml.main(
            ["--synthetic", "--steps", "96", "--seed", "5",
             "--max-history", "8", "--gui", "--gui-port", str(port),
             "--segment", "32", "-o", out])),
        daemon=True)
    t.start()
    time.sleep(2.0)

    frames = []

    async def drive():
        for _ in range(120):
            try:
                ws = await websockets.connect(f"ws://127.0.0.1:{port}",
                                              max_size=2**25)
                break
            except OSError:
                await asyncio.sleep(0.5)
        async with ws:
            async def recv():
                f = json.loads(await asyncio.wait_for(ws.recv(), timeout=600))
                frames.append(f)
                return f

            async def send(obj):
                await ws.send(json.dumps(obj))

            # stream progress frames until the sweep completes
            f = await recv()
            while f.get("progress", 1.0) < 1.0:
                f = await recv()
            base = f
            assert base["type"] == "drawlist"
            assert len(base["points"]) > 0

            # LoopCloseCallback: 0x06 click toggles corrections mode
            await send({"type": "mouse_click", "modifiers": 6,
                        "mouse_down": [0.0, 0.0], "mouse_up": [0.0, 0.0]})
            # two COLINEAR (Shift=4) drags = one correction, applied live
            await send({"type": "mouse_click", "modifiers": 4,
                        "mouse_down": list(map(float, sel[0])),
                        "mouse_up": list(map(float, sel[1]))})
            await send({"type": "mouse_click", "modifiers": 4,
                        "mouse_down": list(map(float, sel[2])),
                        "mouse_up": list(map(float, sel[3]))})
            # the sweep's final frame may be duplicated (localize cb + the
            # completion publish); poll until the post-correction frame
            moved = 0.0
            for _ in range(5):
                f2 = await recv()
                moved = np.abs(
                    np.asarray(f2["points"][: len(base["points"])])
                    - np.asarray(base["points"])).max()
                if moved > 1e-3:
                    break
            assert moved > 1e-3                  # the map moved

            await send({"type": "keyboard", "keycode": 0x56})   # save
            await asyncio.sleep(1.0)
            await send({"type": "shutdown"})

    asyncio.run(drive())
    t.join(timeout=60)
    assert not t.is_alive()
    assert rc.get("code") == 0
    poses = np.loadtxt(out + ".poses")
    assert poses.shape[1] == 3 and len(poses) > 50
    # the session wrote its correction log; a fresh load parses it
    from hitl_slam_tpu.io import logs as logs_mod

    entries = logs_mod.load_log(out + ".correction.log")
    assert len(entries) == 1
    assert entries[0].correction_type == CorrectionType.COLINEAR
    # saved graph loads back (stfs.covars round trip)
    data = stfs_mod.load_stfs_covars(out + ".stfs.covars")
    assert len(data.poses) == len(poses)
