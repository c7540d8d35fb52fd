"""Block-tridiagonal linear solvers for the Gauss-Newton normal equations.

The joint HitL problem's Hessian is exactly block-tridiagonal (3x3 blocks):
odometry factors couple adjacent poses only, and human factors are unary
(see ops/residuals.py). Where the reference hands Ceres a general sparse
problem (SPARSE_SCHUR + LM, JointOptimization.cpp:1064-1138), on TPU we
exploit the structure directly:

  - `thomas_solve`   O(P) sequential block elimination via lax.scan — the
                     trusted reference path and the building block of the
                     multi-chip SPIKE partition (parallel/sharded_solver.py).
  - `bcr_solve`      block cyclic reduction — log2(P) levels of fully
                     vectorized batched 3x3 algebra. Each level is one fused
                     VPU pass; no data-dependent control flow, no scans. This
                     is the single-chip hot path: ~10 vector ops instead of a
                     1000-step scan for P=1024.

3x3 inverses use the closed-form adjugate (`inv3`) rather than batched LU —
branch-free multiply-adds that XLA fuses, numerically fine for the damped SPD
blocks LM produces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def inv3(m: Array) -> Array:
    """Closed-form inverse of batched 3x3 matrices via the adjugate."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], -1),
            jnp.stack([B, E, H], -1),
            jnp.stack([C, F, I], -1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


@jax.jit
def thomas_solve(D: Array, U: Array, b: Array) -> Array:
    """Sequential block-Thomas solve of the symmetric system
       H[i,i] = D[i], H[i,i+1] = U[i], H[i+1,i] = U[i]^T.

    D: [n,3,3], U: [n-1,3,3], b: [n,3]. Returns x: [n,3].
    """
    def fwd(carry, inp):
        S_prev, y_prev = carry          # S = Schur complement, y = modified rhs
        Di, Ui_prev, bi = inp           # Ui_prev = U[i-1] (coupling to i-1)
        W = jnp.swapaxes(Ui_prev, -1, -2) @ inv3(S_prev)  # L_i S_prev^-1
        S = Di - W @ Ui_prev
        y = bi - (W @ y_prev[:, None])[:, 0]
        return (S, y), (S, y)

    S0 = D[0]
    y0 = b[0]
    (_, _), (S_rest, y_rest) = lax.scan(fwd, (S0, y0), (D[1:], U, b[1:]))
    S_all = jnp.concatenate([S0[None], S_rest], 0)
    y_all = jnp.concatenate([y0[None], y_rest], 0)

    xn = (inv3(S_all[-1]) @ y_all[-1][:, None])[:, 0]

    def bwd(x_next, inp):
        Si, Ui, yi = inp                # Ui couples i -> i+1
        x = (inv3(Si) @ (yi - (Ui @ x_next[:, None])[:, 0])[:, None])[:, 0]
        return x, x

    _, xs = lax.scan(
        bwd, xn, (S_all[:-1], U, y_all[:-1]), reverse=True
    )
    return jnp.concatenate([xs, xn[None]], 0)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@jax.jit
def bcr_solve(D: Array, U: Array, b: Array) -> Array:
    """Block cyclic reduction solve of the same system as `thomas_solve`.

    Pads to a power of two with decoupled identity rows, then runs log2(n)
    elimination levels; every level is batched 3x3 algebra over halved arrays
    (static shapes — the level loop is a Python loop unrolled at trace time).
    """
    n = D.shape[0]
    m = _next_pow2(n)
    dt = D.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (m - n, 3, 3))
    Df = jnp.concatenate([D, eye], 0)
    # general (L, U) representation; start symmetric: L[i] = U[i-1]^T
    Uf = jnp.concatenate([U, jnp.zeros((m - n + 1, 3, 3), dt)], 0)  # [m]
    Lf = jnp.concatenate(
        [jnp.zeros((1, 3, 3), dt), jnp.swapaxes(Uf[:-1], -1, -2)], 0
    )  # [m]
    bf = jnp.concatenate([b, jnp.zeros((m - n, 3), dt)], 0)

    levels = []
    while Df.shape[0] > 1:
        De, Do = Df[0::2], Df[1::2]
        Le, Lo = Lf[0::2], Lf[1::2]
        Ue, Uo = Uf[0::2], Uf[1::2]
        be, bo = bf[0::2], bf[1::2]

        Do_inv = inv3(Do)
        DinvL = Do_inv @ Lo            # [h,3,3]
        DinvU = Do_inv @ Uo
        Dinvb = (Do_inv @ bo[..., None])[..., 0]

        # left odd neighbor of even k is odd k-1 (zero-padded at k=0)
        z3 = jnp.zeros((1, 3, 3), dt)
        z1 = jnp.zeros((1, 3), dt)
        DinvL_l = jnp.concatenate([z3, DinvL[:-1]], 0)
        DinvU_l = jnp.concatenate([z3, DinvU[:-1]], 0)
        Dinvb_l = jnp.concatenate([z1, Dinvb[:-1]], 0)

        D_new = De - Le @ DinvU_l - Ue @ DinvL
        L_new = -Le @ DinvL_l
        U_new = -Ue @ DinvU
        b_new = (
            be
            - (Le @ Dinvb_l[..., None])[..., 0]
            - (Ue @ Dinvb[..., None])[..., 0]
        )

        levels.append((Lo, Uo, bo, Do_inv))
        Df, Lf, Uf, bf = D_new, L_new, U_new, b_new

    x = (inv3(Df[0]) @ bf[0][:, None])[:, 0][None]  # [1,3]

    for Lo, Uo, bo, Do_inv in reversed(levels):
        # odds: x_odd[k] = Do_inv[k] (b_odd[k] - Lo[k] x_even[k] - Uo[k] x_even[k+1])
        h = Lo.shape[0]
        x_even = x                                   # [h,3]
        x_even_r = jnp.concatenate([x[1:], jnp.zeros((1, 3), dt)], 0)
        rhs = bo - (Lo @ x_even[..., None])[..., 0] - (Uo @ x_even_r[..., None])[..., 0]
        x_odd = (Do_inv @ rhs[..., None])[..., 0]
        x = jnp.stack([x_even, x_odd], axis=1).reshape(2 * h, 3)

    return x[:n]


def bcr_factor(D: Array, U: Array):
    """Matrix-dependent half of `bcr_solve`, reusable across right-hand
    sides: the per-level elimination operators (Le, Ue, Lo, Uo, Do_inv) and
    the root inverse. `bcr_apply(factor, b)` then solves any b with ONLY
    batched 3x3 matvecs — no inverses, no matrix-matrix products — which is
    what a CG preconditioner wants: factor once per LM iteration, apply once
    per CG iteration (measured 43 ms/apply fused vs ~a third applied, at
    P=8192).

    Returns a pytree: (levels, root_inv, n) where levels is a tuple of
    per-level (Le, Ue, Lo, Uo, Do_inv)."""
    n = D.shape[0]
    m = _next_pow2(n)
    dt = D.dtype
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (m - n, 3, 3))
    Df = jnp.concatenate([D, eye], 0)
    Uf = jnp.concatenate([U, jnp.zeros((m - n + 1, 3, 3), dt)], 0)  # [m]
    Lf = jnp.concatenate(
        [jnp.zeros((1, 3, 3), dt), jnp.swapaxes(Uf[:-1], -1, -2)], 0
    )  # [m]

    levels = []
    while Df.shape[0] > 1:
        De, Do = Df[0::2], Df[1::2]
        Le, Lo = Lf[0::2], Lf[1::2]
        Ue, Uo = Uf[0::2], Uf[1::2]

        Do_inv = inv3(Do)
        DinvL = Do_inv @ Lo
        DinvU = Do_inv @ Uo

        z3 = jnp.zeros((1, 3, 3), dt)
        DinvL_l = jnp.concatenate([z3, DinvL[:-1]], 0)
        DinvU_l = jnp.concatenate([z3, DinvU[:-1]], 0)

        D_new = De - Le @ DinvU_l - Ue @ DinvL
        L_new = -Le @ DinvL_l
        U_new = -Ue @ DinvU

        levels.append((Le, Ue, Lo, Uo, Do_inv))
        Df, Lf, Uf = D_new, L_new, U_new

    return tuple(levels), inv3(Df[0]), n


def bcr_apply(factor, b: Array) -> Array:
    """Solve with a `bcr_factor` factorization: the RHS reduction and
    back-substitution sweeps only. Identical result to
    `bcr_solve(D, U, b)` for the factored (D, U)."""
    levels, root_inv, n = factor
    m = _next_pow2(n)
    dt = b.dtype
    bf = jnp.concatenate([b, jnp.zeros((m - n, 3), dt)], 0)

    rhs_stack = []
    for Le, Ue, Lo, Uo, Do_inv in levels:
        be, bo = bf[0::2], bf[1::2]
        Dinvb = (Do_inv @ bo[..., None])[..., 0]
        z1 = jnp.zeros((1, 3), dt)
        Dinvb_l = jnp.concatenate([z1, Dinvb[:-1]], 0)
        bf = (be
              - (Le @ Dinvb_l[..., None])[..., 0]
              - (Ue @ Dinvb[..., None])[..., 0])
        rhs_stack.append(bo)

    x = (root_inv @ bf[0][:, None])[:, 0][None]  # [1,3]

    for (Le, Ue, Lo, Uo, Do_inv), bo in zip(reversed(levels),
                                            reversed(rhs_stack)):
        x_even = x
        x_even_r = jnp.concatenate([x[1:], jnp.zeros((1, 3), dt)], 0)
        rhs = (bo - (Lo @ x_even[..., None])[..., 0]
               - (Uo @ x_even_r[..., None])[..., 0])
        x_odd = (Do_inv @ rhs[..., None])[..., 0]
        x = jnp.stack([x_even, x_odd], axis=1).reshape(-1, 3)

    return x[:n]


def _assemble_chunk_dense(D_int: Array, U_int: Array) -> Array:
    """Batched dense assembly of chunk-interior block-tridiag matrices.

    D_int: [K, m, 3, 3] interior diagonal blocks; U_int: [K, m-1, 3, 3]
    interior couplings. Returns [K, 3m, 3m].
    """
    K, m = D_int.shape[0], D_int.shape[1]
    n = 3 * m
    r3 = jnp.arange(3)
    A = jnp.zeros((K, n, n), D_int.dtype)
    i = jnp.arange(m)
    rows = (3 * i)[:, None, None] + r3[None, :, None]
    cols = (3 * i)[:, None, None] + r3[None, None, :]
    A = A.at[:, rows, cols].add(D_int)
    j = jnp.arange(m - 1)
    rows = (3 * j)[:, None, None] + r3[None, :, None]
    cols = (3 * (j + 1))[:, None, None] + r3[None, None, :]
    A = A.at[:, rows, cols].add(U_int)
    A = A.at[:, cols.swapaxes(-1, -2), rows.swapaxes(-1, -2)].add(
        jnp.swapaxes(U_int, -1, -2))
    return A


@partial(jax.jit, static_argnames=("chunk",))
def schur_solve(D: Array, U: Array, b: Array, chunk: int = 16) -> Array:
    """Schur-partitioned block-tridiagonal solve — the MXU path.

    Every `chunk`-th pose is a separator; the independent chunk interiors are
    eliminated with ONE batched dense Cholesky ([K, 3(chunk-1), 3(chunk-1)]),
    the separator Schur complement (block-tridiagonal again, ~P/chunk blocks)
    is solved densely, and interiors back-substitute with batched matmuls.
    ~10 large fused XLA ops instead of log2(P) levels of tiny ones; the heavy
    lifting runs on the systolic array. Identical semantics to
    thomas_solve/bcr_solve.
    """
    n = D.shape[0]
    if n < 2 * chunk:
        return bcr_solve(D, U, b)
    dt = D.dtype
    C = chunk
    n_s = -(-(n - 1) // C)            # number of chunks
    n_pad = n_s * C + 1
    pad = n_pad - n
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (pad, 3, 3))
    Df = jnp.concatenate([D, eye], 0)
    Uf = jnp.concatenate([U, jnp.zeros((n_pad - 1 - (n - 1), 3, 3), dt)], 0)
    bf = jnp.concatenate([b, jnp.zeros((pad, 3), dt)], 0)

    m = C - 1                          # interior poses per chunk
    D_int = Df[1:].reshape(n_s, C, 3, 3)[:, :m]
    U_all = Uf.reshape(n_s, C, 3, 3)
    U_int = U_all[:, 1:m]              # within-interior couplings
    U_left = U_all[:, 0]               # separator_k -> first interior
    U_right = U_all[:, m]              # last interior -> separator_{k+1}
    b_int = bf[1:].reshape(n_s, C, 3)[:, :m].reshape(n_s, 3 * m)
    D_sep = Df[::C]                    # [n_s+1, 3, 3]
    b_sep = bf[::C]                    # [n_s+1, 3]

    A = _assemble_chunk_dense(D_int, U_int)          # [K, 3m, 3m]
    # RHS bundle: [B_k | C_k | b_k] with B/C the separator couplings
    B = jnp.zeros((n_s, 3 * m, 3), dt).at[:, 0:3, :].set(
        jnp.swapaxes(U_left, -1, -2))
    Cc = jnp.zeros((n_s, 3 * m, 3), dt).at[:, 3 * m - 3:, :].set(U_right)
    rhs = jnp.concatenate([B, Cc, b_int[..., None]], axis=-1)  # [K, 3m, 7]
    X = jnp.linalg.solve(A, rhs)
    XB, XC, xb = X[..., 0:3], X[..., 3:6], X[..., 6]

    BT = jnp.swapaxes(B, -1, -2)
    CT = jnp.swapaxes(Cc, -1, -2)
    S_kk = BT @ XB                     # [K, 3, 3]
    S_kk1 = BT @ XC
    S_k1k = CT @ XB
    S_k1k1 = CT @ XC
    g_k = (BT @ xb[..., None])[..., 0]
    g_k1 = (CT @ xb[..., None])[..., 0]

    # separator system: block tridiag over n_s+1 separators
    Ds = D_sep.at[:-1].add(-S_kk).at[1:].add(-S_k1k1)
    Us = -S_kk1                        # couples sep k -> k+1; note S_k1k = Us^T
    bs = b_sep.at[:-1].add(-g_k).at[1:].add(-g_k1)
    # small dense solve over separators
    ns3 = 3 * (n_s + 1)
    Hs = jnp.zeros((ns3, ns3), dt)
    r3 = jnp.arange(3)
    i = jnp.arange(n_s + 1)
    rows = (3 * i)[:, None, None] + r3[None, :, None]
    cols = (3 * i)[:, None, None] + r3[None, None, :]
    Hs = Hs.at[rows, cols].add(Ds)
    j = jnp.arange(n_s)
    rows = (3 * j)[:, None, None] + r3[None, :, None]
    cols = (3 * (j + 1))[:, None, None] + r3[None, None, :]
    Hs = Hs.at[rows, cols].add(Us)
    Hs = Hs.at[cols.swapaxes(-1, -2), rows.swapaxes(-1, -2)].add(
        jnp.swapaxes(S_k1k, -1, -2) * -1.0)
    x_sep = jnp.linalg.solve(Hs, bs.reshape(-1)).reshape(n_s + 1, 3)

    # back-substitution for interiors
    x_int = (xb
             - (XB @ x_sep[:-1][..., None])[..., 0]
             - (XC @ x_sep[1:][..., None])[..., 0])    # [K, 3m]
    x = jnp.zeros((n_pad, 3), dt)
    x = x.at[::C].set(x_sep)
    interior_rows = x[1:].reshape(n_s, C, 3).at[:, :m].set(
        x_int.reshape(n_s, m, 3))
    x = x.at[1:].set(interior_rows.reshape(n_pad - 1, 3))
    return x[:n]
