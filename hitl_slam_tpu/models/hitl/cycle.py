"""The fully-fused correction cycle: ONE device program per correction.

verify -> world transform -> EM endpoint refit -> inlier counts -> ordering ->
explicit correction -> constraint instantiation -> backprop -> joint LM solve,
with zero host round trips in between (the reference's entire 'p'-key path,
SURVEY.md section 3.2). The host passes raw clicked points and gets back the
repaired state plus a small stats bundle; invalid/unverified inputs gate the
state update on device (outputs == inputs), mirroring the reference's early
returns (HitLSLAM.cpp:379-484).

This fusion exists for a hardware reason: each host<->device sync over the
TPU tunnel costs ~30-80 ms — more than the entire solve. One program, one
sync.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ...core.state import ConstraintTable
from ...ops.geometry import angle_mod, pose_to_world
from ...solver.joint import build_problem
from ...solver.lm import LMConfig, solve as lm_solve
from . import em_input
from .backprop import backprop
from .explicit import apply_explicit, constraint_deltas
from .ordering import order_on_device
from .repair import _scatter_constraints

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CycleOutput:
    poses: Array
    covariances: Array
    constraints: ConstraintTable
    verified: Array             # scalar bool — all clicked points near map
    order_valid: Array          # scalar bool — ordering/backprop bounds OK
    num_new_constraints: Array  # scalar int32
    refit_sel: Array            # [4,2] EM-refit (and possibly swapped) points
    lm_iterations: Array
    lm_initial_cost: Array
    lm_final_cost: Array
    lm_final_mu: Array          # damping at exit (chain warm-start source)
    pre_solve_poses: Array


@partial(jax.jit, static_argnames=("lm_config",))
def cycle_step(
    points: Array,        # [P,N,2] robot frame
    point_mask: Array,    # [P,N]
    poses: Array,         # [P,3]
    covariances: Array,   # [P,3,3]
    constraints: ConstraintTable,
    ctype: Array,         # scalar int32
    sel_raw: Array,       # [4,2] clicked points, world frame
    write_offset: Array,  # scalar int32
    lm_config: LMConfig = LMConfig(),
    odom_inv_sigma: Array | None = None,  # [P-1,3] loop-closure weighting
    mu0: Array | None = None,  # warm-start damping (chained cycles)
) -> CycleOutput:
    from ...ops.pallas_em import em_scan

    world = pose_to_world(poses[:, None, :], points)

    from ...core.state import CorrectionType

    # POINT selections are degenerate segments [p,p,q,q]; CORNER drags are
    # anchored at a feature vertex — neither gets the segment refit
    is_point = ctype == int(CorrectionType.POINT)
    is_corner = ctype == int(CorrectionType.CORNER)

    # --- verification (HitLSLAM::verifyUserInput) — Pallas sweep ---
    _, min_d2 = em_scan(world, point_mask, sel_raw)
    degenerate = jnp.all(sel_raw[0] == sel_raw[1]) | jnp.all(
        sel_raw[2] == sel_raw[3]
    )
    verified = jnp.all(min_d2 < em_input.VERIFY_THRESHOLD**2) & (
        ~degenerate | is_point)

    # --- EM: refit both sketched segments in ONE batched while_loop, count
    # inliers (Pallas sweep) ---
    segs = em_input.endpoint_adjust_batch(
        world, point_mask, jnp.stack([sel_raw[0:2], sel_raw[2:4]]))
    refit = segs.reshape(4, 2)
    refit = jnp.where(is_point | is_corner, sel_raw, refit)
    # POINT selections count inliers in the wider verify-radius disc (a
    # point pill starves the observation sets on sparse scans); lax.cond
    # keeps the extra sweep off the hot path for segment corrections
    counts, _ = lax.cond(
        is_point,
        lambda: em_scan(world, point_mask, refit,
                        inlier_threshold=em_input.VERIFY_THRESHOLD),
        lambda: em_scan(world, point_mask, refit),
    )
    c1, c2 = counts[:, 0], counts[:, 1]

    # --- ordering / filtering on device ---
    from .ordering import MIN_POSE_INLIERS

    o = order_on_device(c1, c2, refit,
                        min_inliers=jnp.where(is_point, 0,
                                              MIN_POSE_INLIERS))
    valid = verified & o.valid

    # --- explicit correction + constraint targets ---
    poses1, C = apply_explicit(poses, ctype, o.sel, o.group_mask, o.last_pose)
    dpar, dperp, dth, pen, pair_valid = constraint_deltas(
        poses1, o.sel, o.anchor_idx, o.corrected_idx
    )
    table, n_new = _scatter_constraints(
        constraints, ctype, o.anchor_idx, o.corrected_idx,
        dpar, dperp, dth, pen, pair_valid & valid, write_offset,
    )

    # --- backprop + angle wrap ---
    poses2, cov2 = backprop(poses1, covariances, C, o.bp_min, o.bp_max)
    poses2 = poses2.at[:, 2].set(angle_mod(poses2[:, 2]))

    # --- joint LM solve over odometry + all human factors ---
    # (odom_inv_sigma != None is the EnML loop-closure mode: chain factors
    # weighted by the pose covariance ellipses, AddLoopConstraint semantics)
    problem = build_problem(poses2, table, odom_inv_sigma=odom_inv_sigma)
    lm = lm_solve(problem, poses2, lm_config, mu0=mu0)
    poses3 = lm.poses.at[:, 2].set(angle_mod(lm.poses[:, 2]))

    # --- gate the state update on validity ---
    vq = valid
    return CycleOutput(
        poses=jnp.where(vq, poses3, poses),
        covariances=jnp.where(vq, cov2, covariances),
        constraints=table,
        verified=verified,
        order_valid=o.valid,
        num_new_constraints=jnp.where(vq, n_new, 0),
        refit_sel=o.sel,
        lm_iterations=jnp.where(vq, lm.iterations, 0),
        lm_initial_cost=lm.initial_cost,
        lm_final_cost=lm.final_cost,
        lm_final_mu=lm.final_mu,
        pre_solve_poses=poses2,
    )


@partial(jax.jit, static_argnames=("lm_config", "warm_start_mu"))
def queue_chain(
    points: Array,        # [P,N,2] robot frame
    point_mask: Array,    # [P,N]
    poses: Array,         # [P,3]
    covariances: Array,   # [P,3,3]
    constraints: ConstraintTable,
    ctypes: Array,        # [K] int32 per-cycle correction types
    sels: Array,          # [K,4,2] per-cycle clicked points (world frame)
    n0: Array,            # scalar int32 constraint-table write cursor
    lm_config: LMConfig = LMConfig(),
    odom_inv_sigma: Array | None = None,
    warm_start_mu: bool = False,
):
    """K correction cycles fused into ONE device program (lax.scan).

    The serving shape for queued corrections: per-cycle host dispatch costs
    ~25-40 ms through this harness's remote relay — more than the entire
    cycle — so a batch of queued corrections (log replay, auto-repair
    rounds, multi-user queues) runs the whole chain device-resident and
    syncs once. Pad the queue with no-op cycles (all-zero selections are
    degenerate => verified False => identity) so ONE compiled program
    serves any queue length up to K.

    Rejected / non-finite cycles leave the carried state untouched exactly
    like the host path (engine._cycle early-returns): the carry adopts a
    cycle's outputs only when it verified, ordered, and solved finite.

    Returns (poses, covariances, constraints, n_end, per_cycle) where
    per_cycle stacks [K] arrays: (accepted, verified, order_valid, n_new,
    lm_iterations, lm_initial_cost, lm_final_cost).
    """

    def step(carry, x):
        poses, covs, table, n, mu = carry
        ctype, sel = x
        out = cycle_step(points, point_mask, poses, covs, table, ctype,
                         sel, n, lm_config=lm_config,
                         odom_inv_sigma=odom_inv_sigma,
                         mu0=mu if warm_start_mu else None)
        ok = (out.verified & out.order_valid
              & jnp.isfinite(out.lm_final_cost))
        poses2 = jnp.where(ok, out.poses, poses)
        covs2 = jnp.where(ok, out.covariances, covs)
        # the rejected-cycle table may carry freshly-written INACTIVE rows
        # at the unadvanced cursor; drop them like the host path does
        table2 = lax.cond(ok, lambda: out.constraints, lambda: table)
        n_new = jnp.where(ok, out.num_new_constraints, 0)
        # damping warm-start carry: only an ACCEPTED cycle's exit damping
        # describes the current state's curvature. Measured (r4, CPU smoke
        # chain of 4 distinct corrections): warm start INCREASES iteration
        # counts ([6,20,15,12] vs [6,12,10,10] cold) — each correction adds
        # constraint rows, so the previous solve's converged (tiny) mu
        # underestimates the new problem's curvature and early steps get
        # rejected. Hence the default is False; the knob remains for
        # same-problem re-solves (e.g. tolerance continuation), where a
        # carried mu is the right prior.
        mu2 = jnp.where(ok, out.lm_final_mu, mu)
        ys = (ok, out.verified, out.order_valid, n_new,
              out.lm_iterations, out.lm_initial_cost, out.lm_final_cost)
        return (poses2, covs2, table2, n + n_new, mu2), ys

    mu_init = jnp.asarray(lm_config.initial_mu, poses.dtype)
    (poses, covariances, constraints, n_end, _), per_cycle = lax.scan(
        step, (poses, covariances, constraints, n0, mu_init), (ctypes, sels))
    return poses, covariances, constraints, n_end, per_cycle
