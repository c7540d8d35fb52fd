"""Round-3 TPU measurement batch 3: gn_unroll codegen A/B (queue item 4).

Two questions the EnmlOptions.gn_unroll default (None = fully unroll) rests
on, both previously measured only on CPU:
  a) steady-state: does the fully-unrolled GN body still beat
     lax.fori_loop(unroll=k) under the outer window scan on real TPU?
  b) compile: how long does the remote-compile relay take for a
     freiburg-like config (gn_iterations=50) fully unrolled vs capped?

Persistent compilation cache is deliberately NOT enabled — compile wall
times here must include the relay. Outputs are forced with jax.device_get
(NOTES.md timing trap). Run ALONE.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_tpu_measure3.py
"""
import time

import jax
import numpy as np

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.io.figure8 import generate_raw_stream
from hitl_slam_tpu.models.enml.driver import EpisodeOptions, build_episodes
from hitl_slam_tpu.models.enml.localizer import EnmlOptions, batch_localize

print("backend:", jax.devices()[0].platform, flush=True)


def force(out):
    return sum(float(np.sum(np.asarray(jax.device_get(x), np.float64)))
               for x in jax.tree_util.tree_leaves(out))


def run(label, est, opts, n=3):
    t0 = time.perf_counter()
    out = batch_localize(est.points, est.normals, est.point_mask,
                         est.poses, opts)
    force(out)
    compile_s = time.perf_counter() - t0
    ts = []
    for i in range(n):
        # vary input per call (defeats any relay result reuse)
        pts = est.points + np.float32((i + 1) * 1e-6)
        t0 = time.perf_counter()
        out = batch_localize(pts, est.normals, est.point_mask,
                             est.poses, opts)
        force(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label}: first-call {compile_s:.1f} s, steady min "
          f"{min(ts):.1f} ms  {['%.0f' % t for t in ts]}", flush=True)


scans, angles, rel, _, _ = generate_raw_stream(num_steps=160, num_rays=240,
                                               seed=11)
e_poses, e_pcs, e_ncs, _ = build_episodes(
    scans, angles, rel, EpisodeOptions(clip_low=10, clip_high=10))
est = make_map_state(e_poses, np.zeros((len(e_poses), 3, 3), np.float32),
                     e_pcs, e_ncs)
print("nodes:", est.num_poses, flush=True)

# (a) bench-shape steady state: default W=10 gn=12
for k in (None, 2, 4):
    run(f"batch_localize W=10 gn=12 unroll={k}", est,
        EnmlOptions(gn_unroll=k))

# (b) freiburg-like gn budget (W=10 so the brute window match stays small;
# the unroll knob only changes the GN body replication, which is what the
# compile cost is linear in)
for k in (2, None):
    run(f"batch_localize W=10 gn=50 unroll={k}", est,
        EnmlOptions(gn_iterations=50, gn_unroll=k), n=2)

print("MEASURE3 DONE", flush=True)
