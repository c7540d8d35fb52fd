"""Structure-of-arrays normal-equations assembly for the joint LM solve.

Numerically identical (up to f32 reassociation) to joint.normal_equations,
but every intermediate is a flat [P]-length vector instead of a [P,3,3]
block array. Motivation (measured, NOTES.md): at P=8192 the composed AoS
assembly costs ~4-5 ms/LM-iteration on TPU even though each constituent op
measures <=0.12 ms in isolation — an XLA fusion/layout pathology specific to
arrays with tiny (3x3) minor dimensions, which tile onto the (8,128)
vector-register shape at a fraction of occupancy. In SoA form the entire
assembly is ~30 fused elementwise passes over [P] lanes plus ONE stack into
the [P,3,3] block layout the tridiagonal solver consumes.

The closed forms below come from the structure of the odometry Jacobians
(ops/residuals.py odometry_jacobians; reference semantics
JointOptimization.cpp:736-825): with

    p = ax*cos(th0) - ay*sin(th0),  q = ax*sin(th0) + ay*cos(th0)
    ARot = [[i0*p, i0*q], [-i1*q, i1*p]]      (B @ R(-th0))

the factor blocks reduce to

    S   = ARot^T ARot = [[i0^2 p^2 + i1^2 q^2, (i0^2-i1^2) p q],
                         [(i0^2-i1^2) p q,     i0^2 q^2 + i1^2 p^2]]
    t   = ARot^T du   (du = d(scaled residual)/dth0, a 2-vector)
    J1^T J1 = [[S, -t], [-t^T, du.du + i2^2]]
    J2^T J2 = [[S, 0], [0, i2^2]]
    U = J1^T J2 = [[-S, 0], [t^T, -i2^2]]

Human factors enter through the CompactHuman per-pose reduction
(ops/residuals.py), converted to SoA once per solve by `soa_constants`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.geometry import angle_mod
from .joint import JointProblem

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SoaConstants:
    """Per-solve constants in lane-major (flat [P]/[F]) layout."""

    ax: Array   # [F] radial direction x
    ay: Array   # [F] radial direction y
    d: Array    # [F] radial translation target
    w: Array    # [F] rotation target
    # compact human terms, [P] each (A symmetric: 6 unique entries)
    A00: Array
    A01: Array
    A02: Array
    A11: Array
    A12: Array
    A22: Array
    c0: Array
    c1: Array
    c2: Array
    q00: Array
    q01: Array
    q02: Array
    k: Array    # scalar cost offset


def soa_constants(problem: JointProblem) -> SoaConstants:
    """Unpack the problem's factor constants into SoA vectors (once per
    solve; the [P,3,3]->6x[P] slicing happens here, outside the LM loop)."""
    od = problem.odom
    ch = problem.compact
    A = ch.A.reshape(-1, 9).T  # [9, P]
    c = ch.c.T                 # [3, P]
    q0 = ch.q0.T
    return SoaConstants(
        ax=od.axis[:, 0, 0], ay=od.axis[:, 0, 1], d=od.radial, w=od.rotation,
        A00=A[0], A01=A[1], A02=A[2], A11=A[4], A12=A[5], A22=A[8],
        c0=c[0], c1=c[1], c2=c[2], q00=q0[0], q01=q0[1], q02=q0[2],
        k=ch.k,
    )


def normal_equations_soa(
    problem: JointProblem, sc: SoaConstants, poses: Array
) -> tuple[Array, Array, Array, Array]:
    """SoA drop-in for joint.normal_equations: returns (D [P,3,3],
    U [P-1,3,3], g [P,3], cost), gauge-fixed at pose 0."""
    dtype = poses.dtype
    P = problem.num_poses
    i0, i1, i2 = (problem.odom.inv_sigma[:, 0], problem.odom.inv_sigma[:, 1],
                  problem.odom.inv_sigma[:, 2])
    pt = poses.T                       # [3, P]: lane-major
    x, y, th = pt[0], pt[1], pt[2]
    x0, y0, th0 = x[:-1], y[:-1], th[:-1]
    x1, y1, th1 = x[1:], y[1:], th[1:]

    cth, sth = jnp.cos(th0), jnp.sin(th0)
    dtx, dty = x1 - x0, y1 - y0
    vx = cth * dtx + sth * dty         # v = R(-th0) dt
    vy = -sth * dtx + cth * dty

    # residuals
    u0 = sc.ax * vx + sc.ay * vy
    u1 = -sc.ay * vx + sc.ax * vy
    r0 = (u0 - sc.d) * i0
    r1 = u1 * i1
    r2 = angle_mod(th1 - th0 - sc.w) * i2

    # Jacobian scalars
    p = sc.ax * cth - sc.ay * sth
    q = sc.ax * sth + sc.ay * cth
    du0 = i0 * (sc.ax * vy - sc.ay * vx)
    du1 = -i1 * (sc.ay * vy + sc.ax * vx)

    i0sq, i1sq, i2sq = i0 * i0, i1 * i1, i2 * i2
    S00 = i0sq * p * p + i1sq * q * q
    S01 = (i0sq - i1sq) * p * q
    S11 = i0sq * q * q + i1sq * p * p
    t0 = i0 * p * du0 - i1 * q * du1
    t1 = i0 * q * du0 + i1 * p * du1
    e22 = du0 * du0 + du1 * du1 + i2sq

    gv0 = i0 * p * r0 - i1 * q * r1
    gv1 = i0 * q * r0 + i1 * p * r1
    g2a = du0 * r0 + du1 * r1 - i2 * r2   # J1^T r third component
    g2b = i2 * r2                          # J2^T r third component

    # human factors (CompactHuman in SoA): e = q0 - poses
    e0, e1, e2 = sc.q00 - x, sc.q01 - y, sc.q02 - th
    Ae0 = sc.A00 * e0 + sc.A01 * e1 + sc.A02 * e2
    Ae1 = sc.A01 * e0 + sc.A11 * e1 + sc.A12 * e2
    Ae2 = sc.A02 * e0 + sc.A12 * e1 + sc.A22 * e2
    gh0, gh1, gh2 = -(sc.c0 + Ae0), -(sc.c1 + Ae1), -(sc.c2 + Ae2)
    cost_h = 0.5 * (sc.k + jnp.sum(e0 * (2.0 * sc.c0 + Ae0)
                                   + e1 * (2.0 * sc.c1 + Ae1)
                                   + e2 * (2.0 * sc.c2 + Ae2)))

    # D accumulation: pad the [F] factor vectors left/right onto [P] slots
    z1 = jnp.zeros((1,), dtype)

    def padl(a):   # contribution of factor f to pose f+1 (J2 side)
        return jnp.concatenate([z1, a])

    def padr(a):   # contribution of factor f to pose f (J1 side)
        return jnp.concatenate([a, z1])

    D00 = sc.A00 + padr(S00) + padl(S00)
    D01 = sc.A01 + padr(S01) + padl(S01)
    D02 = sc.A02 + padr(-t0)
    D11 = sc.A11 + padr(S11) + padl(S11)
    D12 = sc.A12 + padr(-t1)
    D22 = sc.A22 + padr(e22) + padl(jnp.full((P - 1,), i2sq, dtype))

    g0 = gh0 + padr(-gv0) + padl(gv0)
    g1 = gh1 + padr(-gv1) + padl(gv1)
    g2 = gh2 + padr(g2a) + padl(g2b)

    # gauge fix pose 0 (keep in SoA: cheaper than block writes)
    gate = jnp.concatenate([jnp.zeros((1,), dtype),
                            jnp.ones((P - 1,), dtype)])
    D00, D11, D22 = D00 * gate + (1.0 - gate), D11 * gate + (1.0 - gate), \
        D22 * gate + (1.0 - gate)
    D01, D02, D12 = D01 * gate, D02 * gate, D12 * gate
    g0, g1, g2 = g0 * gate, g1 * gate, g2 * gate
    uz = jnp.concatenate([jnp.zeros((1,), dtype),
                          jnp.ones((P - 2,), dtype)]) if P > 2 else \
        jnp.zeros((P - 1,), dtype)

    zF = jnp.zeros((P - 1,), dtype)
    mi2 = jnp.full((P - 1,), -i2sq, dtype)

    # ONE layout change each: [3,3,P] stack -> [P,3,3] transpose
    D = jnp.stack([
        jnp.stack([D00, D01, D02]),
        jnp.stack([D01, D11, D12]),
        jnp.stack([D02, D12, D22]),
    ]).transpose(2, 0, 1)
    U = (jnp.stack([
        jnp.stack([-S00, -S01, zF]),
        jnp.stack([-S01, -S11, zF]),
        jnp.stack([t0, t1, mi2]),
    ]) * uz).transpose(2, 0, 1)
    g = jnp.stack([g0, g1, g2]).T

    cost = 0.5 * jnp.sum(r0 * r0 + r1 * r1 + r2 * r2) + cost_h
    return D, U, g, cost
