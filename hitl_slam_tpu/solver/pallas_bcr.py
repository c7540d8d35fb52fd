"""Pallas TPU kernel: block cyclic reduction in ONE kernel launch.

`tridiag.bcr_solve` is mathematically right for TPU (log-depth, batched 3x3
algebra, no scans) but executes as ~10 levels x dozens of small XLA ops;
inside the LM while_loop the solve is dispatch/op-overhead-bound, not
compute-bound (measured r4, scripts/r4_tpu_measure4.py: damp+BCR ~0.7
ms/iter in-loop at P=1024 while the whole iteration's useful FLOPs are
~10^6 — <0.1% of one v5e core). This kernel runs the ENTIRE solve — both
sweeps, all levels — as one `pallas_call` with every operand resident in
VMEM.

Formulation: in-place, full-width, masked cyclic reduction.

  - State: D, L, U as [9, m] component-row planes (m = next_pow2(n), lane
    dim = block index), b as [3, m]. 3x3 algebra is unrolled scalar
    row-arithmetic on [1, m] vectors — the same SoA trick as
    solver/assembly_soa.py, for the same reason (no [_,3,3] minor dims).
  - Downward level k (h = 2^(k-1)): lanes e = 0 mod 2^k absorb their odd
    neighbors e +- h via `pltpu.roll` by +-h and a lane-index mask. Only
    even lanes update; eliminated lanes keep their values FOREVER — which
    is exactly the per-level history back-substitution needs, so no
    level stacks exist at all (the halved-array XLA version must save
    (Lo, Uo, bo, Do_inv) per level).
  - Upward level k: lanes o = h mod 2^k solve x_o = D_o^{-1} (b_o - L_o
    x_{o-h} - U_o x_{o+h}) from their frozen elimination-time rows; the
    right neighbor of the last odd lane (o + h = m) is masked to zero —
    the zero-row pad of the XLA version.

Numerically identical algebra to `tridiag.bcr_solve` (same adjugate
inverses, same elimination order); tests assert agreement to f32
round-off. Falls back to interpret mode off-TPU so CPU tests exercise the
same code path (reference solved by ceres::Solve, SPARSE_SCHUR:
JointOptimization.cpp:1064-1138).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# ---- unrolled 3x3 SoA algebra on lists of [1, m] rows ----
# row order for a 3x3 block: [a00,a01,a02, a10,a11,a12, a20,a21,a22]

def _inv3(r):
    a, b, c, d, e, f, g, h, i = r
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    inv_det = 1.0 / (a * A + b * B + c * C)
    # adjugate layout: inv[i][j] = cofactor[j][i]
    return [A * inv_det, D * inv_det, G * inv_det,
            B * inv_det, E * inv_det, H * inv_det,
            C * inv_det, F * inv_det, I * inv_det]


def _mm3(x, y):
    """3x3 @ 3x3 on component rows."""
    return [
        x[3 * i + 0] * y[0 * 3 + j]
        + x[3 * i + 1] * y[1 * 3 + j]
        + x[3 * i + 2] * y[2 * 3 + j]
        for i in range(3) for j in range(3)
    ]


def _mv3(x, v):
    """3x3 @ 3-vector on component rows."""
    return [
        x[3 * i + 0] * v[0] + x[3 * i + 1] * v[1] + x[3 * i + 2] * v[2]
        for i in range(3)
    ]


def _bcr_kernel(D_ref, L_ref, U_ref, b_ref, x_ref, *, m, interpret):
    # pltpu.roll rejects negative shifts; a left-roll by h is a right-roll
    # by m - h on the circular lane dim
    roll = (jnp.roll if interpret
            else lambda x, s, axis: pltpu.roll(x, s % m, axis=axis))

    def rows(ref, k):
        return [ref[j:j + 1, :] for j in range(k)]

    D = rows(D_ref, 9)
    L = rows(L_ref, 9)
    U = rows(U_ref, 9)
    b = rows(b_ref, 3)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)

    def roll_all(xs, shift):
        return [roll(x, shift, axis=1) for x in xs]

    def mask_all(xs, mk):
        z = jnp.zeros_like(xs[0])
        return [jnp.where(mk, x, z) for x in xs]

    def sel_all(mk, new, old):
        return [jnp.where(mk, nw, od) for nw, od in zip(new, old)]

    def sub_all(xs, ys, zs):
        return [x - y - z for x, y, z in zip(xs, ys, zs)]

    levels = m.bit_length() - 1  # log2(m)

    # ---- downward elimination ----
    for k in range(1, levels + 1):
        h = 1 << (k - 1)
        even = (lane & ((1 << k) - 1)) == 0
        Dinv = _inv3(D)
        DinvL = _mm3(Dinv, L)
        DinvU = _mm3(Dinv, U)
        Dinvb = _mv3(Dinv, b)
        # left odd neighbor e-h (zero past the top), right odd e+h
        lok = lane >= h
        rok = lane < (m - h)
        DinvL_l = mask_all(roll_all(DinvL, h), lok)
        DinvU_l = mask_all(roll_all(DinvU, h), lok)
        Dinvb_l = mask_all(roll_all(Dinvb, h), lok)
        DinvL_r = mask_all(roll_all(DinvL, -h), rok)
        DinvU_r = mask_all(roll_all(DinvU, -h), rok)
        Dinvb_r = mask_all(roll_all(Dinvb, -h), rok)

        D_new = sub_all(D, _mm3(L, DinvU_l), _mm3(U, DinvL_r))
        L_new = [-x for x in _mm3(L, DinvL_l)]
        U_new = [-x for x in _mm3(U, DinvU_r)]
        b_new = sub_all(b, _mv3(L, Dinvb_l), _mv3(U, Dinvb_r))

        D = sel_all(even, D_new, D)
        L = sel_all(even, L_new, L)
        U = sel_all(even, U_new, U)
        b = sel_all(even, b_new, b)

    # every lane now holds its elimination-time (root-time for lane 0)
    # system; one full-width inverse serves the root AND all upward levels
    Dinv = _inv3(D)

    # ---- root + upward back-substitution ----
    x = mask_all(_mv3(Dinv, b), lane == 0)
    for k in range(levels, 0, -1):
        h = 1 << (k - 1)
        odd = (lane & ((1 << k) - 1)) == h
        x_l = roll_all(x, h)                        # x[o-h]
        x_r = mask_all(roll_all(x, -h), lane < (m - h))  # x[o+h], 0 at m
        rhs = sub_all(b, _mv3(L, x_l), _mv3(U, x_r))
        x = sel_all(odd, _mv3(Dinv, rhs), x)

    for j in range(3):
        x_ref[j:j + 1, :] = x[j]


@jax.jit
def bcr_solve_pallas(D: Array, U: Array, b: Array) -> Array:
    """Drop-in replacement for `tridiag.bcr_solve` (same signature and
    semantics): D [n,3,3], U [n-1,3,3], b [n,3] -> x [n,3]."""
    n = D.shape[0]
    m = _next_pow2(max(n, 128))  # lane-dim floor: one full vreg row
    dt = D.dtype

    # block components -> [9, m] lane-major planes, identity/zero padded
    D9 = D.reshape(n, 9).T
    pad = jnp.zeros((9, m - n), dt)
    if m > n:
        eye = jnp.tile(jnp.asarray(
            [1, 0, 0, 0, 1, 0, 0, 0, 1], dt)[:, None], (1, m - n))
        D9 = jnp.concatenate([D9, eye], 1)
    U9 = U.reshape(n - 1, 9).T
    U9 = jnp.concatenate([U9, jnp.zeros((9, m - n + 1), dt)], 1)
    # L[i] = U[i-1]^T: transpose = component-row permutation, shift right
    UT = U9[jnp.asarray([0, 3, 6, 1, 4, 7, 2, 5, 8])]
    L9 = jnp.concatenate([jnp.zeros((9, 1), dt), UT[:, :-1]], 1)
    b3 = jnp.concatenate([b.T, jnp.zeros((3, m - n), dt)], 1)

    interpret = jax.default_backend() != "tpu"
    x = pl.pallas_call(
        functools.partial(_bcr_kernel, m=m, interpret=interpret),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, m), dt),
        interpret=interpret,
    )(D9, L9, U9, b3)
    return x[:, :n].T
