"""Device-mesh helpers.

The framework's two parallel axes (SURVEY.md section 2.7 mapping):

  "replica" — data parallelism over independent map replicas (the batched
              throughput configuration: many perturbed maps optimized at
              once, BASELINE.json config #5). The reference has no analog
              (one map at a time).
  "pose"    — sequence parallelism over the trajectory/pose axis: point
              clouds, residual evaluation, and the normal-equation assembly
              shard along poses; the tiny block-tridiagonal solve is
              all-gathered (it is KBs) and solved redundantly. This replaces
              the reference's OpenMP loops over poses
              (JointOptimization.cpp:575 etc.).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_replica: int = 1, n_pose: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_replica * n_pose
    if len(devices) < n:
        raise RuntimeError(
            f"need {n} devices for a (replica={n_replica}, pose={n_pose}) "
            f"mesh, but jax.devices() = {devices}. For a virtual multi-chip "
            "run, force the CPU backend BEFORE jax initializes: "
            "jax.config.update('jax_platforms', 'cpu'); "
            f"jax.config.update('jax_num_cpu_devices', {n}) "
            "(see tests/conftest.py / __graft_entry__._force_virtual_cpu_devices)."
        )
    arr = np.asarray(devices[:n]).reshape(n_replica, n_pose)
    return Mesh(arr, ("replica", "pose"))


def replica_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-maps arrays: leading axis over 'replica'."""
    return NamedSharding(mesh, P("replica"))


def pose_sharding(mesh: Mesh) -> NamedSharding:
    """Single-map arrays: leading (pose) axis over 'pose'."""
    return NamedSharding(mesh, P("pose"))


def batched_pose_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-maps arrays sharded on both axes: [B, P, ...]."""
    return NamedSharding(mesh, P("replica", "pose"))
