"""Matrix-free preconditioned conjugate gradient for the GN normal equations.

The direct block-tridiagonal solvers (solver/tridiag.py) are exact and fast
at HitL scales; this PCG path is the scalable alternative the design calls
for (BASELINE.json north star: "batched sparse Gauss-Newton/LM solver ...
with CG linear solves on device"):

  - the Hessian is applied matrix-free: one fused pass computes
    H v = D v + U v_+ + U^T v_-  (tridiagonal part) plus optional extra
    terms supplied as a callable (e.g. STF factor products), so arbitrary
    factor graphs solve without materializing H;
  - block-Jacobi preconditioning via the closed-form 3x3 inverse;
  - fixed-shape `lax.while_loop` with relative-residual termination.

Communication-free within a chip; under pose-axis sharding the Hv product
needs only a one-block halo exchange, making this the multi-chip path for
trajectories that outgrow the all-gathered direct solve.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .tridiag import inv3

Array = jax.Array


def tridiag_matvec(D: Array, U: Array, v: Array) -> Array:
    """H v for the symmetric block-tridiagonal H (same convention as
    thomas_solve): [n,3] -> [n,3]."""
    out = (D @ v[..., None])[..., 0]
    out = out.at[:-1].add((U @ v[1:][..., None])[..., 0])
    out = out.at[1:].add((jnp.swapaxes(U, -1, -2) @ v[:-1][..., None])[..., 0])
    return out


def pcg_solve(
    D: Array,
    U: Array,
    b: Array,
    extra_matvec: Callable[[Array], Array] | None = None,
    max_iterations: int = 256,
    tolerance: float = 1e-6,
    x0: Array | None = None,
    preconditioner: str = "jacobi",
) -> tuple[Array, Array, Array]:
    """Solve (H_tridiag + extra) x = b. Returns (x, final_rel_residual,
    iterations).

    preconditioner:
      - "jacobi": closed-form 3x3 block-diagonal inverse (cheapest apply).
      - "tridiag": EXACT solve of the block-tridiagonal part via BCR —
        the preconditioned operator is I + M^-1 * extra, so CG iteration
        counts depend only on the strength of the off-tridiagonal factor
        coupling, not on the chain's condition number. Each apply is a
        log-depth BCR pass; worth it when `extra` is present and the
        Jacobi-preconditioned solve needs hundreds of iterations.
    """
    dtype = b.dtype

    def A(v):
        out = tridiag_matvec(D, U, v)
        if extra_matvec is not None:
            out = out + extra_matvec(v)
        return out

    if preconditioner == "tridiag":
        # factor ONCE per linear solve, apply per CG iteration: the
        # matrix-dependent elimination operators are shared across all
        # right-hand sides, so each apply is matvec-only (measured ~3x
        # cheaper than the fused bcr_solve at P=8192)
        from .tridiag import bcr_apply, bcr_factor

        fac = bcr_factor(D, U)

        def prec(r):
            return bcr_apply(fac, r)
    else:
        Minv = inv3(D)  # block-Jacobi preconditioner

        def prec(r):
            return (Minv @ r[..., None])[..., 0]

    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - A(x)
    z = prec(r)
    p = z
    rz = jnp.sum(r * z)
    b_norm = jnp.maximum(jnp.linalg.norm(b), 1e-30)

    def cond(state):
        _, r, _, _, it = state
        return (jnp.linalg.norm(r) / b_norm > tolerance) & (
            it < max_iterations)

    def body(state):
        x, r, p, rz, it = state
        Ap = A(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, _, _, it = lax.while_loop(
        cond, body, (x, r, p, rz, jnp.asarray(0, jnp.int32)))
    return x, jnp.linalg.norm(r) / b_norm, it


@jax.jit
def pcg_tridiag(D: Array, U: Array, b: Array) -> Array:
    """Drop-in linear_solver for solver/lm.py (same signature as
    thomas_solve/bcr_solve)."""
    x, _, _ = pcg_solve(D, U, b)
    return x
