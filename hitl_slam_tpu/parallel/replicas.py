"""Replica (data-parallel) batching: optimize many map replicas at once.

BASELINE.json config #5: "32 perturbed Figure8 replicas optimized in parallel
via vmap over maps". The reference processes one map per process; on TPU the
whole joint solve vmaps over a leading replica axis and shards it across the
'replica' mesh axis — statistical robustness tests (the reference's
--statistical-test/--noise mode, vector_mapping_main.cpp:2912-2917) become a
single batched program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import ConstraintTable
from ..solver.joint import build_problem
from ..solver.lm import LMConfig, LMResult, solve as lm_solve

Array = jax.Array


@partial(jax.jit, static_argnames=("config",))
def batched_solve(
    poses: Array,            # [B, P, 3]
    table: ConstraintTable,  # leaves with leading [B] axis
    config: LMConfig = LMConfig(),
) -> LMResult:
    """vmap of problem build + LM solve over the replica axis."""

    # one-hot selector cache is gated on the TOTAL batch footprint: the
    # per-replica [C, P] selectors stack to B x C x P (measured ~2x faster
    # than the scatter path at bench scale, 1 GB transient at B=32)
    B, P = poses.shape[0], poses.shape[1]
    C = table.ctype.shape[1] if table.ctype.ndim > 1 else table.ctype.shape[0]
    use_onehot = B * P * C <= 384 * 1024 * 1024

    # pin the XLA BCR here: vmap of the Pallas single-kernel BCR serializes
    # one whole-kernel launch per replica (measured 446 ms for B=8 vs
    # 109 ms for B=32 with the XLA solver, which batches across replicas
    # inside each op) — the launch-overhead argument for the Pallas kernel
    # inverts once there is a batch axis to amortize over
    from ..solver.tridiag import bcr_solve

    def one(poses_b, table_b):
        problem = build_problem(poses_b, table_b, use_onehot=use_onehot)
        return lm_solve(problem, poses_b, config, linear_solver=bcr_solve)

    return jax.vmap(one)(poses, table)


def make_perturbed_replicas(
    poses: np.ndarray,
    table: ConstraintTable,
    num_replicas: int,
    trans_noise: float = 0.02,
    angle_noise: float = 0.005,
    seed: int = 0,
) -> tuple[Array, ConstraintTable]:
    """[B, P, 3] pose perturbations + broadcast constraint table."""
    rng = np.random.default_rng(seed)
    base = np.asarray(poses, np.float32)
    reps = np.tile(base[None], (num_replicas, 1, 1))
    reps[:, :, :2] += rng.normal(0, trans_noise,
                                 reps[:, :, :2].shape).astype(np.float32)
    reps[:, :, 2] += rng.normal(0, angle_noise,
                                reps[:, :, 2].shape).astype(np.float32)
    reps[:, 0] = base[0]  # keep the gauge pose identical
    batched_table = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (num_replicas,) + x.shape), table
    )
    return jnp.asarray(reps), batched_table


def shard_replicas(mesh: Mesh, poses_b: Array, table_b: ConstraintTable):
    """Place the replica axis across the 'replica' mesh axis."""
    sh = NamedSharding(mesh, P("replica"))
    return (
        jax.device_put(poses_b, sh),
        jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), table_b),
    )
