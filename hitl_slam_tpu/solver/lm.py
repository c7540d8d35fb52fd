"""Levenberg-Marquardt minimizer, fully on device.

Replaces ceres::Solve (LM trust region, SPARSE_SCHUR) for the joint HitL
problem (JointOptimization.cpp:1064-1138): a `lax.while_loop` over LM
iterations with Madsen-Nielsen-Tingleff damping updates (the same scheme
Ceres's LEVENBERG_MARQUARDT strategy implements), Jacobi-scaled damping
(mu * diag(H), as Ceres does with its diagonal trust-region scaling), and
Ceres-compatible termination:

  - max_num_iterations      (reference default 100, JointOptimization.cpp:1070)
  - function_tolerance      |dcost| <= tol * cost      (Ceres default 1e-6)
  - rejected steps count as iterations, as in Ceres.

The linear solve is block cyclic reduction (solver/tridiag.py) — log-depth,
no scans — so one LM iteration is a handful of fused vector passes.
NO_CONVERGENCE (hitting the iteration cap) is treated as success, matching
the reference's explicit behavior (JointOptimization.cpp:1123-1133).

Normal-equations assembly defaults to the SoA path (solver/assembly_soa.py):
identical math in lane-major [P]-vector form. Measured on v5e: 8.73 ->
3.26 ms/LM-iter at P=8192, 1.93 -> 1.69 at P=1024 (the AoS [P,3,3]
block-array composition hits an XLA fusion/layout pathology at large P).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .joint import JointProblem, normal_equations
from .tridiag import bcr_solve

# largest pose count the single-launch Pallas BCR kernel can compile for on
# this target: its scoped-vmem stack is linear in next_pow2(P) and measures
# 22.99 MB at P=8192 vs the 16 MB limit (see solve() docstring)
_PALLAS_BCR_MAX_POSES = 4096


def _default_linear_solver(backend: str, num_poses: int):
    """Default block-tridiagonal solver selection (unit-tested so the vmem
    gate cannot silently regress): the single-launch Pallas kernel on TPU
    up to _PALLAS_BCR_MAX_POSES, the XLA-op BCR everywhere else."""
    import os

    if (backend == "tpu" and num_poses <= _PALLAS_BCR_MAX_POSES
            and not os.environ.get("HITL_NO_PALLAS_BCR")):
        from .pallas_bcr import bcr_solve_pallas

        return bcr_solve_pallas
    return bcr_solve

Array = jax.Array


@dataclass(frozen=True)
class LMConfig:
    max_iterations: int = 100
    function_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-7   # Ceres parameter_tolerance analog
    initial_mu: float = 1e-4        # damping = mu * diag(H)
    mu_collapse: float = 1e10       # trust region collapsed -> converged
    min_diagonal: float = 1e-6      # clamp for Jacobi scaling (as in Ceres)
    max_diagonal: float = 1e32


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LMResult:
    poses: Array        # [P, 3] optimized
    final_cost: Array   # scalar
    initial_cost: Array
    iterations: Array   # scalar int32
    converged: Array    # scalar bool (function tolerance reached)
    final_mu: Array     # scalar — damping at exit (warm-start source)


def solve(
    problem: JointProblem,
    poses0: Array,
    config: LMConfig = LMConfig(),
    linear_solver: Callable[[Array, Array, Array], Array] | None = None,
    use_soa: bool = True,
    mu0: Array | None = None,
) -> LMResult:
    """Run LM from poses0. Static over pose count; jit/vmap-safe.

    Default linear solver: block cyclic reduction — the single-kernel
    Pallas version on TPU, the XLA-op version elsewhere (identical algebra;
    pallas_bcr.py runs interpret-mode off TPU but that is for tests, not
    speed). Measured on v5e hardware (full repair workload, not
    microbenchmarks):
      - Pallas BCR: full LM body in-loop 0.64 -> 0.42 ms/iter at P=1024
        (r4, scripts/r4_tpu_measure5.py) — the solve is dispatch-bound and
        one kernel launch beats ~10 levels of small XLA ops.
      - XLA BCR: ~47 ms/repair cycle at P=1024; 8192-pose 20-iter solve
        132 ms.
      - thomas scan: standalone microbenchmark looks 5x faster (36us vs
        191us), but INSIDE the LM while_loop each scan step costs ~15us and
        the cycle balloons to ~500 ms (8192-pose solve: 5.1 s). Sequential
        scans nested in outer loops do not pipeline on this target.
      - schur_solve (batched-dense MXU): TPU's jnp.linalg.solve is
        numerically weaker than the adjugate arithmetic and stalls the
        damping loop.
    Escape hatch: HITL_NO_PALLAS_BCR=1 restores the XLA BCR on TPU.

    Size gate (r5): the whole-solve kernel keeps every elimination level's
    full-width temporaries in VMEM; Mosaic's scoped-vmem stack measures
    22.99 MB at m=8192 against this target's 16 MB limit (remote-compile
    failure observed round 5 — it silently zeroed every >4096-pose TPU
    surface in the round-4 driver bench). Linear in m, so m=4096 fits with
    ~4.5 MB headroom; above the gate the XLA-op BCR (identical algebra,
    measured 59-73 ms for the 8192-pose 20-iter solve) takes over.
    """
    if linear_solver is None:
        linear_solver = _default_linear_solver(jax.default_backend(),
                                               poses0.shape[0])
    dtype = poses0.dtype
    if use_soa:
        # SoA assembly: identical math in lane-major scalar form — avoids the
        # [P,3,3]-minor-dim XLA fusion pathology at large P (assembly_soa.py)
        from .assembly_soa import normal_equations_soa, soa_constants

        sc = soa_constants(problem)

        def assemble(x):
            return normal_equations_soa(problem, sc, x)
    else:
        def assemble(x):
            return normal_equations(problem, x)

    D0, U0, g0, c0 = assemble(poses0)

    # Each iteration does exactly ONE fused residual+Jacobian pass — at the
    # trial point — producing both the acceptance cost and (on accept) the
    # next iteration's normal equations. A rejected step keeps the carried
    # system; nothing is reassembled at the unchanged point.
    def body(state):
        x, D, U, g, mu, nu, c, it, done = state
        diag = jnp.clip(
            jnp.diagonal(D, axis1=-2, axis2=-1),
            config.min_diagonal,
            config.max_diagonal,
        )
        D_damped = D + mu * jax.vmap(jnp.diag)(diag)
        step = linear_solver(D_damped, U, -g)            # [P,3]
        x_new = x + step
        D_new, U_new, g_new, c_new = assemble(x_new)

        # model decrease for the gain ratio: L(0)-L(step)
        # = -g.step - 0.5 step^T H step;  with H step ~= -g - mu*Dg*step:
        # standard MNT form: 0.5 * step^T (mu * Dg * step - g)
        pred = 0.5 * jnp.sum(step * (mu * diag * step - g))
        rho = (c - c_new) / jnp.maximum(pred, 1e-30)

        accept = (rho > 0) & jnp.isfinite(c_new)
        x = jnp.where(accept, x_new, x)
        D = jnp.where(accept, D_new, D)
        U = jnp.where(accept, U_new, U)
        g = jnp.where(accept, g_new, g)
        c_next = jnp.where(accept, c_new, c)

        factor = jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
        ).astype(dtype)
        mu = jnp.where(accept, mu * factor, mu * nu)
        nu = jnp.where(accept, jnp.asarray(2.0, dtype), nu * 2.0)
        mu = jnp.clip(mu, 1e-32, 1e32)

        # Ceres-style termination: relative function decrease (only
        # meaningful on an accepted step), relative step size, or
        # trust-region collapse (mu runaway means f32 noise floor).
        # The step-size check deliberately applies to REJECTED steps too,
        # as Ceres's ParameterToleranceReached does each iteration: a
        # rejected tiny step means the damped system already moves x by
        # noise, and every future retry (larger mu) shrinks the step
        # further — without this, a solve that reaches the f32 noise floor
        # between the function-tolerance grid points burns ~10 iterations
        # rejecting while mu climbs 20 orders of magnitude to mu_collapse
        # (measured r4 on TPU: headline chain cycle iterations [5,19,6,7]
        # -> [1,15,6,7] at identical GT error, traces in
        # scripts/r4_tpu_measure3.py).
        fdone = accept & (jnp.abs(c - c_new) <= config.function_tolerance * c)
        xnorm = jnp.linalg.norm(x)
        sdone = (
            jnp.linalg.norm(step)
            <= config.parameter_tolerance * (xnorm + config.parameter_tolerance)
        )
        mdone = mu >= config.mu_collapse
        return x, D, U, g, mu, nu, c_next, it + 1, done | fdone | sdone | mdone

    def cond(state):
        return (state[-2] < config.max_iterations) & ~state[-1]

    if mu0 is None:
        mu_init = jnp.asarray(config.initial_mu, dtype)
    else:
        # warm start: a chained solve seeds the damping from the previous
        # solve's exit value, clipped into a sane trust-region band — the
        # exit mu of a CONVERGED solve is a good curvature prior for the
        # perturbed problem the next correction creates, but an exit via
        # trust-region collapse (mu ~ 1e10) must not freeze the next solve
        mu_init = jnp.clip(jnp.asarray(mu0, dtype), 1e-6, 1e-1)
    init = (
        poses0, D0, U0, g0,
        mu_init,
        jnp.asarray(2.0, dtype),
        c0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    out = lax.while_loop(cond, body, init)
    x, c, it, done = out[0], out[6], out[7], out[8]
    return LMResult(
        poses=x, final_cost=c, initial_cost=c0, iterations=it, converged=done,
        final_mu=out[4],
    )


@partial(jax.jit, static_argnames=("config", "use_soa"))
def solve_jit(problem: JointProblem, poses0: Array,
              config: LMConfig = LMConfig(),
              use_soa: bool = True) -> LMResult:
    return solve(problem, poses0, config, use_soa=use_soa)
