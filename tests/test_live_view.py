"""Live scan view + background map + GUI-initiated localization seeds
(VERDICT r3 items 5 and 8).

Protocol-level coverage of the reference's liveView surfaces
(vector_display_thread.cpp): laser scan rendering at the live pose
(:650-668, :960-974), background vector-map drawing with ChangeMap-style
switching and autoUpdateMap (:141-176, :246-249, :560-570), and the
GUI -> localizer Set Position / AutoLocalize path (:218-226, :527-551),
all driven over the websocket bus against `cli_enml --online --gui`.
"""

import json
import os
import threading
import time

import numpy as np
import pytest

from hitl_slam_tpu.gui.live import (KINECT_SCAN_COLOR, LIDAR_POINT_COLOR,

                                    MAP_LINE_COLOR, LiveView, load_atlas)

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full

PORT = 8793


def _write_maps(folder):
    os.makedirs(folder, exist_ok=True)
    with open(os.path.join(folder, "a.vectors.txt"), "w") as f:
        f.write("0.0,0.0,4.0,0.0\n")
    with open(os.path.join(folder, "b.vectors.txt"), "w") as f:
        f.write("0.0,1.0,0.0,5.0\n0.0,5.0,4.0,5.0\n")
    with open(os.path.join(folder, "atlas.txt"), "w") as f:
        f.write("0 a\n1 b\n")


def test_live_view_unit(tmp_path):
    """LiveView host-side semantics: atlas, ChangeMap, autoUpdateMap,
    scan latching + timeout, world-frame transform with laser offset."""
    from hitl_slam_tpu.gui.drawlist import DrawList

    folder = str(tmp_path / "maps")
    _write_maps(folder)
    assert load_atlas(folder) == ["a", "b"]

    lv = LiveView(maps_folder=folder, map_name="a")
    assert lv.map_name == "a" and len(lv.map_segments) == 1
    assert not lv.change_map("nope")
    # autoUpdateMap: announced map switches the background; toggled off it
    # does not (vector_display_thread.cpp:246-249)
    assert lv.maybe_auto_switch("b") and lv.map_name == "b"
    lv.auto_update_map = False
    assert not lv.maybe_auto_switch("a") and lv.map_name == "b"

    # one beam straight ahead at 2 m, robot at (1, 0) facing +x: world point
    # x = 1 + 0.145 (laser offset) + 2
    lv.on_laser([2.0], 0.0, 0.1, 0.02, 10.0, now=100.0)
    dl = DrawList()
    lv.compile(dl, (1.0, 0.0, 0.0), now=100.1)
    scan_pts = [p for p, c in zip(dl.points, dl.points_col)
                if c == LIDAR_POINT_COLOR]
    assert len(scan_pts) == 1
    np.testing.assert_allclose(scan_pts[0], (3.145, 0.0), atol=1e-6)
    assert sum(c == MAP_LINE_COLOR for c in dl.lines_col) == 2  # map b

    # MessageTimeout: a stale scan is dropped unless persistentDisplay
    dl2 = DrawList()
    lv.compile(dl2, (1.0, 0.0, 0.0), now=101.5)
    assert not any(c == LIDAR_POINT_COLOR for c in dl2.points_col)
    lv.persistent_display = True
    dl3 = DrawList()
    lv.compile(dl3, (1.0, 0.0, 0.0), now=101.5)
    assert any(c == LIDAR_POINT_COLOR for c in dl3.points_col)

    # kinect channel renders from the robot origin (no laser offset)
    lv.on_kinect([1.0], 0.0, 0.1, 0.02, 10.0, now=102.0)
    dl4 = DrawList()
    lv.compile(dl4, (0.0, 0.0, 0.0), now=102.0)
    kin = [p for p, c in zip(dl4.points, dl4.points_col)
           if c == KINECT_SCAN_COLOR]
    np.testing.assert_allclose(kin[0], (1.0, 0.0), atol=1e-6)


def test_online_live_view_protocol(tmp_path):
    """End-to-end over the wire: online session streams scan frames,
    accepts a set_location seed (pose jumps), auto-switches the background
    map from the announcement, and honors change_map + the autoUpdateMap
    toggle."""
    import asyncio

    import websockets

    from hitl_slam_tpu import cli_enml

    folder = str(tmp_path / "maps")
    _write_maps(folder)
    out = str(tmp_path / "live")

    rc = []
    t = threading.Thread(
        target=lambda: rc.append(cli_enml.main(
            # rate 0.1 -> 0.5 s/scan: the stream must outlast the scripted
            # GUI interactions so seeds land MID-stream (queue order), else
            # no post-seed nodes exist to assert on
            ["--synthetic", "--steps", "48", "--online", "--gui",
             "--gui-port", str(PORT), "--rate", "0.1", "-o", out,
             "--maps-folder", folder, "--background-map", "a", "--hold"])),
        daemon=True)
    t.start()
    time.sleep(2.0)

    got = {}

    async def drive():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}",
                                      max_size=2**24) as ws:
            async def recv():
                return json.loads(
                    await asyncio.wait_for(ws.recv(), timeout=60))

            async def recv_until(pred, tries=200):
                for _ in range(tries):
                    f = await recv()
                    if f.get("type") == "drawlist" and pred(f):
                        return f
                raise AssertionError("condition never met in stream")

            def scan_pts(f):
                return [p for p, c in zip(f["points"], f["points_col"])
                        if c == LIDAR_POINT_COLOR]

            def map_lines(f):
                return [(tuple(p1), tuple(p2)) for p1, p2, c in
                        zip(f["lines_p1"], f["lines_p2"], f["lines_col"])
                        if c == MAP_LINE_COLOR]

            # live scans flow, background map 'a' drawn
            f = await recv_until(lambda f: len(scan_pts(f)) > 10)
            got["scan_frame"] = len(scan_pts(f))
            assert map_lines(f) == [((0.0, 0.0), (4.0, 0.0))]

            # programmatic set_location with a map announcement:
            # pose seeds AND background auto-switches to 'b'
            await ws.send(json.dumps({"type": "set_location",
                                      "pose": [5.0, 5.0, 0.5],
                                      "map": "b"}))
            f = await recv_until(
                lambda f: len(map_lines(f)) == 2
                and abs(f["robot_pose"][0] - 5.0) < 2.0
                and abs(f["robot_pose"][1] - 5.0) < 2.0)
            got["seeded"] = f["robot_pose"]

            # Set Position drag (modifiers 0x04): position = mouse_down,
            # orientation = drag direction
            await ws.send(json.dumps({"type": "mouse_click",
                                      "modifiers": 4,
                                      "mouse_down": [-3.0, 2.0],
                                      "mouse_up": [-3.0, 3.0]}))

            def traj_near_click(f):
                from hitl_slam_tpu.gui.drawlist import TRAJECTORY_COLOR
                pts = [p for p, c in zip(f["points"], f["points_col"])
                       if c == TRAJECTORY_COLOR]
                # the first post-seed node lands ~one node-spacing
                # (~1.8 m) from the seed; 2.5 m separates it cleanly from
                # the natural trajectory's closest approach (3.6 m)
                return any((p[0] + 3.0) ** 2 + (p[1] - 2.0) ** 2 < 2.5 ** 2
                           for p in pts)

            # wait until an episode NODE is recorded near the seed (not just
            # the live pose) — later messages must not race the node add
            f = await recv_until(
                lambda f: abs(f["robot_pose"][0] + 3.0) < 2.0
                and abs(f["robot_pose"][1] - 2.0) < 2.0
                and traj_near_click(f))
            got["clicked"] = f["robot_pose"]

            # autoUpdateMap off: an announcement no longer switches
            await ws.send(json.dumps({"type": "keyboard",
                                      "keycode": 0x55}))
            await ws.send(json.dumps({"type": "set_location",
                                      "pose": [0.0, 0.0, 0.0],
                                      "map": "a"}))
            f = await recv_until(lambda f: True)
            assert len(map_lines(f)) == 2     # still map 'b'

            # explicit ChangeMap works regardless
            await ws.send(json.dumps({"type": "change_map", "name": "a"}))
            await recv_until(
                lambda f: map_lines(f) == [((0.0, 0.0), (4.0, 0.0))])

            # drain the rest of the stream, then shut the held bridge down
            while not os.path.exists(out + ".poses"):
                await asyncio.sleep(0.25)
            await ws.send(json.dumps({"type": "shutdown"}))

    asyncio.run(drive())
    t.join(timeout=60)
    assert not t.is_alive() and rc == [0]
    poses = np.loadtxt(out + ".poses")
    assert poses.ndim == 2 and poses.shape[1] == 3
    # the set_location seeds moved the live trajectory: some node near the
    # clicked seed (-3, 2); the natural (unseeded) figure-8 never comes
    # within 3.6 m of it
    d = np.linalg.norm(poses[:, :2] - np.array([-3.0, 2.0]), axis=1)
    assert d.min() < 2.5
