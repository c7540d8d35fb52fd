"""HitL-SLAM command-line entry point.

Flag-compatible with the reference executable (HitLSLAM_main.cpp:956-968):
  -P / --pose-graph   .stfs.covars pose-graph file (required)
  -L / --log          correction log to replay
  -V / --save         output name for repaired poses (default
                      hitl_results.txt, the 'v'-key format)

plus TPU-framework extensions:
  --replay-all        headless: replay every log entry, save results, exit
                      (the benchmark/regression mode; the reference needs a
                      human pressing 'l')
  --replay-fused      same, but the whole log runs as fused device chains
                      of up to 8 cycles with one host sync per chain
                      (engine.run_queue — the serving mode for queued
                      corrections)
  --gui               start the websocket GUI bridge and serve draw-lists
  --render PATH       write a PNG render of the (repaired) map
  --config PATH       load solver/engine parameters (hot-reloadable)

Interactive keyboard protocol over the GUI bridge matches the reference
(README.md:178-184): 'p' run correction, 'u' undo, 'v' save, 'l' replay step.
Ctrl-C writes the session log like the reference's SIGINT handler
(HitLSLAM_main.cpp:776-822,930-937).
"""

from __future__ import annotations

import argparse
import signal
import sys
import threading
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hitl-slam-tpu", description=__doc__)
    p.add_argument("-P", "--pose-graph", default=None,
                   help="required except in --test-mode")
    p.add_argument("-L", "--log", default=None)
    p.add_argument("-V", "--save", default="hitl_results.txt")
    p.add_argument("--replay-all", action="store_true")
    p.add_argument("--replay-fused", action="store_true",
                   help="replay the log as fused device chains (one "
                        "dispatch per 8 cycles; see engine.run_queue)")
    p.add_argument("--gui", action="store_true")
    p.add_argument("--gui-port", type=int, default=8765)
    p.add_argument("--render", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--info-mat", default=None,
                   help="write the factor-adjacency PNG after each solve")
    p.add_argument("--map", default=None,
                   help="vector map file for GUI edit mode (add/delete/save "
                        "line segments over the bridge)")
    p.add_argument("--nav-map", default=None,
                   help="navigation graph file for GUI graph-edit mode "
                        "(editGraph navMapMode analog: Shift adds "
                        "vertices/edges, Ctrl deletes, Alt moves, "
                        "Ctrl+Alt edits params)")
    p.add_argument("--semantic-map", default=None,
                   help="semantic graph file for GUI graph-edit mode "
                        "(editGraph semanticMapMode analog: typed/labeled "
                        "vertices and edges)")
    p.add_argument("--test-mode", action="store_true",
                   help="GUI stress mode: stream synthetic draw-lists "
                        "(reference: vector_display --test-mode)")
    p.add_argument("--auto-repair", type=int, default=0, metavar="N",
                   help="headless auto-repair: up to N rounds of "
                        "propose-and-apply loop-closure corrections "
                        "(batched correlative matcher), no human input")
    p.add_argument("--post-optimize", action="store_true",
                   help="run the STF correspondence refinement after the "
                        "replay (the reference's dormant "
                        "PostHumanOptimization stage, live here; dense "
                        "solve <=2k poses, matrix-free PCG above)")
    p.add_argument("--refine-matcher", default="auto",
                   choices=("auto", "global", "pair"),
                   help="correspondence search for --post-optimize: "
                        "'global' 1-NN grid, 'pair' per-pose-pair dense "
                        "tiles (the reference's FindSTFCorrespondences "
                        "semantics; needed on heavily re-traversed maps), "
                        "'auto' falls back global->pair when the global "
                        "matcher yields zero gated bundles")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the whole session "
                        "into DIR (device timeline + host events; open with "
                        "TensorBoard/xprof — the FunctionTimer/Ceres-report "
                        "analog at device granularity, SURVEY §5)")
    return p


def _run_test_mode(port: int) -> int:
    """Synthetic-drawing benchmark loop (vector_display_thread.cpp:1005-1080):
    streams rotating lines/points/text frames so viewers can be exercised
    without a map."""
    import math
    import time as _t

    from .gui.drawlist import DrawList
    from .gui.server import GuiServer

    server = GuiServer(port=port)
    stop = threading.Event()
    server.on_shutdown = stop.set
    server.start()
    print(f"test-mode GUI bridge on ws://127.0.0.1:{port} (Ctrl-C to stop)")
    t0 = _t.time()
    frames = 0
    try:
        while not stop.is_set():
            dl = DrawList()
            phase = (_t.time() - t0)
            for k in range(64):
                a = phase + k * math.pi / 32
                dl.draw_line((0, 0), (10 * math.cos(a), 10 * math.sin(a)),
                             0x404040 + k * 997)
                dl.draw_point((6 * math.cos(2 * a), 6 * math.sin(2 * a)),
                              0xDE2352)
            dl.draw_text((0, 11), f"frame {frames}", 1.0, 0xFFFFFF)
            server.publish(dl)
            frames += 1
            _t.sleep(1.0 / 60.0)
    except KeyboardInterrupt:
        pass
    print(f"\n{frames} frames in {_t.time() - t0:.1f}s")
    server.stop()
    return 0


def main(argv=None) -> int:
    from .utils.timing import install_crash_guard

    install_crash_guard()
    args = build_parser().parse_args(argv)
    if args.profile:
        from .utils.timing import device_trace

        with device_trace("hitl-session", enabled=True,
                          logdir=args.profile):
            rc = _main_impl(args)
        print(f"profiler trace written to {args.profile} "
              "(open with TensorBoard)")
        return rc
    return _main_impl(args)


def _main_impl(args) -> int:
    if args.test_mode:
        return _run_test_mode(args.gui_port)
    if not args.pose_graph:
        print("ERROR: -P/--pose-graph is required", file=sys.stderr)
        return 2

    from .io import logs, stfs
    from .models.hitl.engine import HitLSLAM
    from .solver.lm import LMConfig
    from .utils.config import load_config

    cfg = load_config(args.config) if args.config else None
    lm_config = LMConfig(**cfg.get("lm", {})) if cfg else LMConfig()

    print(f"loading pose graph: {args.pose_graph}")
    try:
        data = stfs.load_stfs_covars(args.pose_graph)
    except (OSError, ValueError, AssertionError) as e:
        # reference behavior: clean error + nonzero exit
        # (HitLSLAM_main.cpp:215-218)
        print(f"ERROR: Unable to open specified pose-graph file: "
              f"{args.pose_graph} ({e})", file=sys.stderr)
        return 1
    print(f"loaded {len(data.poses)} poses, "
          f"{sum(len(pc) for pc in data.point_clouds)} points "
          f"(map '{data.map_name}')")

    engine = HitLSLAM(lm_config=lm_config)
    engine.init(data.poses, data.covariances, data.point_clouds,
                data.normal_clouds)

    input_log = []
    if args.log:
        try:
            input_log = logs.load_log(args.log)
        except (OSError, ValueError, IndexError) as e:
            print(f"ERROR: Unable to parse correction log: {args.log} ({e})",
                  file=sys.stderr)
            return 1
        print(f"loaded {len(input_log)} logged corrections from {args.log}")

    def save_results():
        stfs.save_results_poses(args.save, engine.get_poses())
        print(f"saved {len(data.poses)} poses to {args.save}")

    def write_info_mat():
        if not args.info_mat:
            return
        from .ops.raster import info_matrix_image
        from .utils.image import write_png

        t = engine.state.constraints
        img = info_matrix_image(engine.state.poses[:, 0], t.anchor,
                                t.constrained, t.active)
        write_png(args.info_mat, np.asarray(img))

    def render():
        if not args.render:
            return
        from .ops.raster import render_map
        from .utils.image import write_png

        st = engine.state
        img = render_map(st.world_points(), st.point_mask, st.poses)
        write_png(args.render, np.asarray(img))
        print(f"rendered map to {args.render}")

    def handle_sigint(sig, frame):
        # reference behavior: auto-log the session on Ctrl-C
        history = engine.get_input_history()
        if history:
            name = logs.default_log_name(args.pose_graph)
            logs.save_log(name, history)
            print(f"\nsession log written to {name}")
        print("Terminating.")
        sys.exit(0)

    if threading.current_thread() is threading.main_thread():
        signal.signal(signal.SIGINT, handle_sigint)

    if args.auto_repair > 0:
        # fully-headless repair: rounds of {batched proposals -> apply all}
        # until a round yields nothing (or the round budget is spent).
        # The applied corrections land in the input history, so the session
        # is replayable/loggable exactly like a human one.
        t_start = time.perf_counter()
        applied = 0
        for rnd in range(args.auto_repair):
            props = engine.propose_corrections(max_proposals=4, seed=rnd)
            if not props:
                print(f"[round {rnd}] no proposals; stopping")
                break
            for i, p in enumerate(props):
                rep = engine.replay_log(p.input, record=True)
                status = "ok" if rep.accepted else f"rejected: {rep.reason}"
                applied += int(rep.accepted)
                print(f"[round {rnd}] ({p.anchor_pose},{p.corrected_pose}) "
                      f"score={p.score:.2f} "
                      f"drift={np.linalg.norm(p.drift[:2]):.2f}m: {status}")
                if rep.accepted and i + 1 < len(props):
                    # an accepted correction moves poses, so the remaining
                    # proposals (computed from the pre-round state) are
                    # stale — drop them and re-propose next round (ADVICE
                    # r2; the 0.05 m verification gate alone shouldn't be
                    # the only defense against drifted selections)
                    break
        total = time.perf_counter() - t_start
        print(f"auto-repair: {applied} corrections applied in {total:.2f} s")
        if args.post_optimize:
            rep = engine.post_optimize(matcher=args.refine_matcher)
            print(f"post-optimize (STF refine): lm_iters={rep.lm_iterations} "
                  f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g}")
        save_results()
        write_info_mat()
        render()
        return 0

    if args.replay_fused:
        # serving mode: the whole log runs as fused device chains of up to
        # 8 cycles with ONE host sync per chain (engine.run_queue) — the
        # product form of the bench's pipelined-cycle headline
        live = [e for e in input_log if not e.undone]
        t_start = time.perf_counter()
        reports = engine.run_queue(live)
        total = time.perf_counter() - t_start
        for i, (entry, rep) in enumerate(zip(live, reports)):
            status = "ok" if rep.accepted else f"rejected: {rep.reason}"
            print(f"[{i}] {entry.correction_type.name}: {status} "
                  f"(lm_iters={rep.lm_iterations}, "
                  f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g})")
        n_ok = sum(r.accepted for r in reports)
        print(f"fused-replayed {len(live)} corrections "
              f"({n_ok} accepted) in {total:.2f} s "
              f"({total * 1e3 / max(len(live), 1):.1f} ms/cycle incl. "
              f"one dispatch per 8-cycle chain)")
        if args.post_optimize:
            rep = engine.post_optimize(matcher=args.refine_matcher)
            print(f"post-optimize (STF refine): lm_iters={rep.lm_iterations} "
                  f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g}")
        save_results()
        write_info_mat()
        render()
        return 0

    if args.replay_all:
        t_start = time.perf_counter()
        for i, entry in enumerate(input_log):
            if entry.undone:
                print(f"[{i}] skipping undone entry")
                continue
            t0 = time.perf_counter()
            rep = engine.replay_log(entry)
            dt = (time.perf_counter() - t0) * 1e3
            status = "ok" if rep.accepted else f"rejected: {rep.reason}"
            print(f"[{i}] {entry.correction_type.name}: {status} "
                  f"({dt:.1f} ms, lm_iters={rep.lm_iterations}, "
                  f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g})")
        total = time.perf_counter() - t_start
        print(f"replayed {len(input_log)} corrections in {total:.2f} s")
        if args.post_optimize:
            t0 = time.perf_counter()
            rep = engine.post_optimize(matcher=args.refine_matcher)
            dt = (time.perf_counter() - t0) * 1e3
            print(f"post-optimize (STF refine): lm_iters={rep.lm_iterations} "
                  f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g} "
                  f"({dt:.1f} ms)")
        save_results()
        write_info_mat()
        render()
        return 0

    if args.gui:
        from .gui.display import (display_covariances, display_poses,
                                  display_proposals, display_selection)
        from .gui.server import GuiServer

        server = GuiServer(port=args.gui_port)
        correction_mode = {"on": False}
        replay_idx = {"i": 0}
        proposals = {"list": []}
        show_cov = {"on": False}

        vmap = None
        if args.map:
            from .gui.map_edit import VectorMapFile

            vmap = VectorMapFile(args.map)
        graph = None
        if args.nav_map or args.semantic_map:
            from .gui.graph_edit import GraphMap

            graph = GraphMap(args.semantic_map or args.nav_map,
                             semantic=bool(args.semantic_map))

        def publish():
            dl = display_poses(engine.state)
            display_selection(dl, engine.selected_points)
            if proposals["list"]:
                display_proposals(dl, proposals["list"])
            if show_cov["on"]:
                display_covariances(dl, engine.get_poses(),
                                    engine.get_covariances(),
                                    stride=max(len(engine.get_poses()) // 128,
                                               1))
            if vmap is not None:
                vmap.to_drawlist(dl)
            if graph is not None:
                graph.to_drawlist(dl)
            server.publish(dl)

        def on_map_edit(msg):
            if vmap is None:
                return
            from .gui.map_edit import handle_map_edit

            if handle_map_edit(vmap, msg):
                publish()

        def on_graph_edit(msg):
            if graph is None:
                return
            from .gui.graph_edit import handle_graph_edit

            if handle_graph_edit(graph, msg):
                publish()

        def on_click(ev):
            if correction_mode["on"]:
                engine.add_correction_points(
                    ev.modifiers, np.asarray(ev.mouse_down),
                    np.asarray(ev.mouse_up))
                publish()

        def on_capture(filename: str):
            # LocalizationGuiCaptureSrv equivalent: headless render to PNG
            from .ops.raster import render_map
            from .utils.image import write_png

            st = engine.state
            img = render_map(st.world_points(), st.point_mask, st.poses)
            write_png(filename, np.asarray(img))
            print(f"captured map to {filename}")

        def on_key(ev):
            if ev.keycode == 0x50:      # 'p'
                correction_mode["on"] = not correction_mode["on"]
                if not correction_mode["on"]:
                    rep = engine.run()
                    print(f"cycle: accepted={rep.accepted} {rep.reason}")
                    write_info_mat()
                    publish()
            elif ev.keycode == 0x55:    # 'u'
                if engine.undo():
                    publish()
            elif ev.keycode == 0x56:    # 'v'
                save_results()
            elif ev.keycode == 0x4C:    # 'l'
                if replay_idx["i"] < len(input_log):
                    engine.replay_log(input_log[replay_idx["i"]])
                    replay_idx["i"] += 1
                    publish()
            elif ev.keycode == 0x41:    # 'a': propose / accept suggestion
                if not proposals["list"]:
                    proposals["list"] = engine.propose_corrections()
                    print(f"{len(proposals['list'])} correction proposals")
                else:
                    p = proposals["list"][0]
                    rep = engine.replay_log(p.input)
                    print(f"proposal ({p.anchor_pose},{p.corrected_pose}) "
                          f"accepted={rep.accepted} {rep.reason}")
                    proposals["list"] = []
                publish()
            elif ev.keycode == 0x43:    # 'c': toggle covariance ellipses
                show_cov["on"] = not show_cov["on"]
                publish()
            elif ev.keycode == 0x4F:    # 'o': post-human STF refine
                if correction_mode["on"]:
                    print("cannot post-optimize while in correction mode")
                else:
                    rep = engine.post_optimize(matcher=args.refine_matcher)
                    print(f"post-optimize: {rep.reason} "
                          f"lm_iters={rep.lm_iterations} cost "
                          f"{rep.initial_cost:.4g} -> {rep.final_cost:.4g}")
                    publish()

        server.on_mouse_click = on_click
        server.on_keyboard = on_key
        server.on_capture = on_capture
        stop = threading.Event()
        server.on_map_edit = on_map_edit
        server.on_graph_edit = on_graph_edit
        server.on_shutdown = stop.set
        server.start()
        publish()
        print(f"GUI bridge listening on ws://127.0.0.1:{args.gui_port} "
              f"(keys: p=correct u=undo v=save l=replay a=propose/accept "
              f"c=covariances o=post-optimize)")
        try:
            while not stop.wait(0.5):
                pass
        except KeyboardInterrupt:
            handle_sigint(None, None)
        server.stop()
        return 0

    # no mode selected: print summary and save
    if args.post_optimize:
        t0 = time.perf_counter()
        rep = engine.post_optimize(matcher=args.refine_matcher)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"post-optimize (STF refine): lm_iters={rep.lm_iterations} "
              f"cost {rep.initial_cost:.4g} -> {rep.final_cost:.4g} "
              f"({dt:.1f} ms)")
    save_results()
    render()
    return 0


if __name__ == "__main__":
    sys.exit(main())
