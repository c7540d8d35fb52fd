"""EnML batch-localization command line — the `vector_mapping` executable's
role (vector_mapping_main.cpp:2885-3021): raw scan stream -> episodes ->
batch localize -> .stfs.covars / .poses outputs, with the reference's
statistical-test hooks (--noise fault injection over multiple seeded trials,
:2912-2960, SaveResults :719).

Input "bags" are .npz files with arrays {scans [T,R], angles [R],
rel_odometry [T,3]} (io/figure8.generate_raw_stream writes compatible data;
--synthetic generates one on the fly).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(prog="enml-tpu", description=__doc__)
    p.add_argument("-b", "--bag", default=None,
                   help="ROS1 .bag (sensor_msgs/LaserScan + odometry) or "
                        ".npz scan stream")
    p.add_argument("--max-laser-poses", type=int, default=None,
                   help="stop after this many laser messages (bag input)")
    p.add_argument("--time-skip", type=float, default=0.0,
                   help="seconds of bag to skip from the start")
    p.add_argument("--use-kinect", action="store_true",
                   help="subscribe /Cobot/Kinect/Scan instead of the lidar "
                        "topics (the reference's use_kinect mode — exactly "
                        "one scanner is ever subscribed, "
                        "vector_mapping_main.cpp:1366-1372)")
    p.add_argument("--synthetic", action="store_true",
                   help="generate a synthetic figure-8 stream instead")
    p.add_argument("--steps", type=int, default=256)
    p.add_argument("-o", "--output", default="enml_out")
    p.add_argument("--map-name", default="EnML")
    p.add_argument("--noise", type=float, default=0.0,
                   help="encoder noise factor for fault injection")
    p.add_argument("--statistical-test", type=int, default=0, metavar="N",
                   help="run N noisy trials and save per-trial poses")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-history", type=int, default=10)
    p.add_argument("--config", action="append", default=None,
                   help="config file (repeatable, evaluated in order): the "
                        "reference's executable Lua .cfg files load "
                        "UNMODIFIED (common.cfg, robot.cfg, "
                        "non_markov_localization.cfg — domain/robot "
                        "override blocks honored), or a TOML/JSON mirror; "
                        "the NonMarkovLocalization table uses the "
                        "reference's parameter names")
    p.add_argument("--domain", default=None,
                   help="force enml_domain for the Lua config's domain "
                        "override blocks (cobot / freiburg / orebro)")
    p.add_argument("--robot", default=None,
                   help="force RobotConfig.name for the Lua config's "
                        "per-robot override blocks (e.g. Cobot3)")
    p.add_argument("--parallel-windows", action="store_true",
                   help="checkerboard-parallel window solver (batched "
                        "red/black windows instead of the sequential sweep)")
    p.add_argument("--gn-unroll", type=int, default=None, metavar="K",
                   help="cap the GN-step loop unroll at K bodies "
                        "(lax.fori_loop codegen): XLA compile time drops "
                        "from O(gn_iterations) to O(K) — the reference's "
                        "freiburg/orebro domains set max_solver_iterations"
                        "=50, ~3 min of compile fully unrolled. Default: "
                        "fully unrolled (fastest steady-state on TPU)")
    p.add_argument("--scan-period", type=float, default=0.05,
                   help="seconds between scans, for the realtime factor "
                        "(the reference reads it from bag timestamps)")
    p.add_argument("--online", action="store_true",
                   help="producer/consumer live mode (the reference's "
                        "SensorUpdate/OdometryUpdate path, vector_mapping"
                        ".cpp:2913-2933): stream messages through the "
                        "background localizer thread instead of batch "
                        "solving; writes <output>.poses + <output>.stfs")
    p.add_argument("--rate", type=float, default=0.0, metavar="X",
                   help="with --online: pace the stream at X times "
                        "realtime (0 = as fast as possible)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR "
                        "(device timeline; open with TensorBoard/xprof)")
    return p


def _run_online(args, scans, angles, rel, opts, ep_opts) -> int:
    """Replay the stream through the OnlineLocalizer's producer/consumer
    protocol and save the live trajectory."""
    from .io.stfs import save_results_poses, save_stfs
    from .models.enml.online import OnlineLocalizer

    ol = OnlineLocalizer(episode_options=ep_opts, enml_options=opts)
    ol.start()
    t0 = time.perf_counter()
    period = args.scan_period / args.rate if args.rate > 0 else 0.0
    flushed = False
    try:
        for i in range(len(scans)):
            if i == 0:
                # driver convention: rel[0] is the absolute start pose
                # (set_location-anchored bags; apply_set_locations row 0)
                if np.any(np.asarray(rel[0])):
                    ol.set_location(*[float(v) for v in rel[0]])
            else:
                ol.odometry_update(*[float(v) for v in rel[i]])
            ol.sensor_update(np.asarray(scans[i]), np.asarray(angles))
            if period:
                time.sleep(period)
        # real completion barrier (drain() returns while the final window
        # solve is still in flight; a cold first compile can take minutes)
        flushed = ol.flush(timeout=1800.0)
        poses_list, clouds, _normals = ol.snapshot()
    finally:
        ol.stop()
    dt = time.perf_counter() - t0
    if not flushed:
        print("online: localizer did not finish within 30 min; "
              "aborting without writing outputs", file=sys.stderr)
        return 1
    n = len(poses_list)
    if n == 0:
        print("online: no episode nodes created (stream too short or "
              "all scans empty)", file=sys.stderr)
        return 1
    poses = np.stack(poses_list)
    save_results_poses(args.output + ".poses", poses)
    save_stfs(args.output + ".stfs", args.map_name, time.time(),
              poses, clouds)
    rtf = (len(scans) * args.scan_period) / max(dt, 1e-9)
    x, y, th = poses[-1]
    print(f"online: {n} episode nodes localized live in {dt:.2f}s "
          f"({rtf:.1f}x realtime at {1 / args.scan_period:.0f} Hz scans); "
          f"final pose ({x:.3f}, {y:.3f}, {th:.3f}); "
          f"wrote {args.output}.poses and {args.output}.stfs")
    return 0


def _load_stream(args):
    if args.synthetic or args.bag is None:
        from .io.figure8 import generate_raw_stream

        scans, angles, rel, gt, _ = generate_raw_stream(
            num_steps=args.steps, seed=args.seed)
        return list(scans), angles, rel
    if args.bag.endswith(".bag"):
        from .io.rosbag import KINECT_TOPIC, bag_to_stream

        try:
            scans, angles, rel, set_loc = bag_to_stream(
                args.bag, max_laser_msgs=args.max_laser_poses,
                time_skip=args.time_skip,
                laser_topics=(KINECT_TOPIC,) if args.use_kinect else None)
        except (ValueError, OSError) as e:
            raise SystemExit(f"ERROR: {e}")
        if set_loc:
            # apply each re-localization at its STREAM position (the
            # reference resets global_location/angle mid-run,
            # vector_mapping_main.cpp:1271-1289 — subsequent poses
            # integrate from the given map-frame pose)
            from .io.rosbag import apply_set_locations

            for k, loc in set_loc:
                print(f"set_location @scan {k}: x={loc[0]:.2f} "
                      f"y={loc[1]:.2f} angle={loc[2]:.3f}")
            rel = apply_set_locations(rel, set_loc)
        return list(scans), angles, rel
    try:
        data = np.load(args.bag)
        return list(data["scans"]), data["angles"], data["rel_odometry"]
    except Exception as e:
        raise SystemExit(
            f"ERROR: {args.bag!r} is neither a .bag file nor an .npz "
            f"stream archive with scans/angles/rel_odometry ({e})")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.profile:
        from .utils.timing import device_trace

        with device_trace("enml-run", enabled=True, logdir=args.profile):
            rc = _main_impl(args)
        print(f"profiler trace written to {args.profile} "
              "(open with TensorBoard)")
        return rc
    return _main_impl(args)


def _main_impl(args) -> int:
    from .models.enml.driver import (
        EpisodeOptions,
        apply_noise_model,
        build_episodes,
        consistency_metric,
        localize_and_save,
    )
    from .models.enml.localizer import EnmlOptions

    scans, angles, rel = _load_stream(args)
    print(f"stream: {len(scans)} scans x {len(angles)} beams")
    opts = EnmlOptions(max_history=args.max_history,
                       gn_unroll=args.gn_unroll)
    ep_opts = EpisodeOptions(clip_low=10, clip_high=10)
    if args.config:
        import dataclasses

        from .models.enml.driver import options_from_table
        from .utils.config import load_config

        overrides = {}
        if args.domain:
            overrides["enml_domain"] = args.domain
        if args.robot:
            overrides["RobotConfig.name"] = args.robot

        from .utils.config import is_lua_config as _is_lua

        # ALL Lua files evaluate in ONE shared interpreter environment, in
        # listed order, merged at the first Lua file's position: the
        # reference workflow sets cross-file globals (robot.cfg's
        # RobotConfig drives non_markov_localization.cfg's per-robot
        # blocks), which per-file evaluation would silently lose
        try:
            lua_files = [p for p in args.config if _is_lua(p)]
        except OSError as e:
            raise SystemExit(f"ERROR: cannot load config: {e}")
        lua_merged = False
        cfg: dict = {}
        for path in args.config:
            try:
                if _is_lua(path):
                    if lua_merged:
                        continue
                    from .utils.luaconfig import load_lua_config

                    part = load_lua_config(lua_files, overrides or None)
                    lua_merged = True
                else:
                    part = load_config(path)
            except (OSError, ValueError) as e:
                raise SystemExit(f"ERROR: cannot load config {path}: {e}")
            for k, v in part.items():
                if isinstance(v, dict) and isinstance(cfg.get(k), dict):
                    cfg[k].update(v)
                else:
                    cfg[k] = v
        table = cfg.get("NonMarkovLocalization", cfg)
        if not isinstance(table, dict) or not table:
            raise SystemExit(
                "ERROR: config has no NonMarkovLocalization table")
        opts, ep_cfg = options_from_table(table)
        if args.gn_unroll is not None:
            opts = dataclasses.replace(opts, gn_unroll=args.gn_unroll)
        # keep the CLI's beam clipping (synthetic/test streams are
        # full-FOV; the reference clips via num_skip_readings instead)
        ep_opts = dataclasses.replace(ep_cfg, clip_low=ep_opts.clip_low,
                                      clip_high=ep_opts.clip_high)
        dom = cfg.get("enml_domain")
        print(f"config: domain={dom!r} map={table.get('map_name')!r} "
              f"match_threshold={opts.point_match_threshold} "
              f"max_history={opts.max_history} "
              f"gn_iterations={opts.gn_iterations} "
              f"sensor_offset={tuple(ep_opts.sensor_offset)}")
    elif args.domain or args.robot:
        raise SystemExit("ERROR: --domain/--robot require --config")

    def run_once(rel_odom, tag=""):
        t0 = time.perf_counter()
        poses, pcs, ncs, rels = build_episodes(
            scans, angles, rel_odom, ep_opts)
        new_poses, covs = localize_and_save(
            poses, pcs, ncs, args.output + tag, map_name=args.map_name,
            options=opts, parallel_windows=args.parallel_windows)
        dt = time.perf_counter() - t0
        before = consistency_metric(poses, pcs)
        after = consistency_metric(new_poses, pcs)
        # the reference prints bag-duration / process-duration
        # (vector_mapping_main.cpp:2357-2359)
        rtf = (len(scans) * args.scan_period) / max(dt, 1e-9)
        print(f"{tag or 'run'}: {len(poses)} episode nodes localized in "
              f"{dt:.2f}s ({rtf:.1f}x realtime at {1 / args.scan_period:.0f} "
              f"Hz scans); consistency {before:.4f} -> {after:.4f}; "
              f"wrote {args.output + tag}.stfs.covars")
        return new_poses

    if args.online:
        if args.statistical_test > 0 or args.parallel_windows:
            raise SystemExit("ERROR: --online is incompatible with "
                             "--statistical-test/--parallel-windows")
        if args.noise > 0:
            rng = np.random.default_rng(args.seed)
            rel = rel.copy()
            for i in range(len(rel)):
                rel[i] = apply_noise_model(
                    *[float(v) for v in rel[i]], args.noise, rng)
        return _run_online(args, scans, angles, rel, opts, ep_opts)

    if args.statistical_test > 0:
        rng = np.random.default_rng(args.seed)
        for trial in range(args.statistical_test):
            noisy = rel.copy()
            for i in range(len(noisy)):
                noisy[i] = apply_noise_model(
                    *[float(v) for v in rel[i]], args.noise, rng)
            run_once(noisy, tag=f".trial{trial}")
        return 0

    if args.noise > 0:
        rng = np.random.default_rng(args.seed)
        noisy = rel.copy()
        for i in range(len(noisy)):
            noisy[i] = apply_noise_model(
                *[float(v) for v in rel[i]], args.noise, rng)
        rel = noisy
    run_once(rel)
    return 0


if __name__ == "__main__":
    sys.exit(main())
