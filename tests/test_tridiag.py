import jax
import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.solver.tridiag import bcr_solve, inv3, thomas_solve


def _random_spd_tridiag(rng, n):
    """Random symmetric positive-definite block-tridiagonal system."""
    U = rng.normal(size=(n - 1, 3, 3)).astype(np.float64) * 0.3
    D = np.zeros((n, 3, 3))
    for i in range(n):
        A = rng.normal(size=(3, 3))
        D[i] = A @ A.T + 4.0 * np.eye(3)  # diagonally dominant -> SPD overall
    b = rng.normal(size=(n, 3)).astype(np.float64)
    return D, U, b


def _dense(D, U):
    n = D.shape[0]
    H = np.zeros((3 * n, 3 * n))
    for i in range(n):
        H[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = D[i]
        if i + 1 < n:
            H[3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = U[i]
            H[3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = U[i].T
    return H


def test_inv3(rng):
    m = rng.normal(size=(10, 3, 3))
    m = m @ np.swapaxes(m, -1, -2) + 3 * np.eye(3)
    out = np.asarray(inv3(jnp.asarray(m, jnp.float32)))
    expected = np.linalg.inv(m)
    np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)


def test_thomas_matches_dense(rng):
    for n in (2, 3, 5, 17):
        D, U, b = _random_spd_tridiag(rng, n)
        x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)
        x = np.asarray(
            thomas_solve(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
                         jnp.asarray(b, jnp.float32))
        )
        np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=2e-3)


def test_bcr_matches_dense(rng):
    for n in (1, 2, 3, 4, 7, 8, 33, 100):
        D, U, b = _random_spd_tridiag(rng, n)
        x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)
        x = np.asarray(
            bcr_solve(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
                      jnp.asarray(b, jnp.float32))
        )
        np.testing.assert_allclose(x, x_ref, rtol=5e-3, atol=5e-3)


def test_bcr_factor_apply_matches_fused(rng):
    """bcr_factor + bcr_apply (the reusable-factorization split the PCG
    preconditioner uses) is bit-level-close to the fused bcr_solve, and one
    factorization serves multiple right-hand sides."""
    from hitl_slam_tpu.solver.tridiag import bcr_apply, bcr_factor

    for n in (1, 2, 3, 4, 7, 8, 33, 100):
        D, U, b = _random_spd_tridiag(rng, n)
        Dj, Uj, bj = (jnp.asarray(a, jnp.float32) for a in (D, U, b))
        fac = bcr_factor(Dj, Uj)
        x_fused = np.asarray(bcr_solve(Dj, Uj, bj))
        x_split = np.asarray(bcr_apply(fac, bj))
        np.testing.assert_allclose(x_split, x_fused, rtol=1e-5, atol=1e-5)
        b2 = jnp.asarray(b[::-1].copy(), jnp.float32)
        np.testing.assert_allclose(np.asarray(bcr_apply(fac, b2)),
                                   np.asarray(bcr_solve(Dj, Uj, b2)),
                                   rtol=1e-5, atol=1e-5)


def test_bcr_matches_thomas_large(rng):
    n = 257
    D, U, b = _random_spd_tridiag(rng, n)
    Dj, Uj, bj = (jnp.asarray(a, jnp.float32) for a in (D, U, b))
    x1 = np.asarray(thomas_solve(Dj, Uj, bj))
    x2 = np.asarray(bcr_solve(Dj, Uj, bj))
    np.testing.assert_allclose(x1, x2, rtol=3e-3, atol=3e-3)


def test_schur_matches_dense(rng):
    from hitl_slam_tpu.solver.tridiag import schur_solve

    for n in (33, 64, 100, 129, 257):
        D, U, b = _random_spd_tridiag(rng, n)
        x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)
        x = np.asarray(schur_solve(
            jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
            jnp.asarray(b, jnp.float32), chunk=16))
        np.testing.assert_allclose(x, x_ref, rtol=6e-3, atol=6e-3,
                                   err_msg=f"n={n}")
    # small-n fallback path
    D, U, b = _random_spd_tridiag(rng, 12)
    x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(12, 3)
    x = np.asarray(schur_solve(jnp.asarray(D, jnp.float32),
                               jnp.asarray(U, jnp.float32),
                               jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(x, x_ref, rtol=5e-3, atol=5e-3)


def test_pcg_matches_dense(rng):
    from hitl_slam_tpu.solver.cg import pcg_solve, pcg_tridiag

    for n in (16, 100, 257):
        D, U, b = _random_spd_tridiag(rng, n)
        x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)
        x, rel, it = jax.jit(
            lambda D_, U_, b_: pcg_solve(D_, U_, b_, tolerance=1e-7)
        )(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
          jnp.asarray(b, jnp.float32))
        assert float(rel) < 1e-5
        np.testing.assert_allclose(np.asarray(x), x_ref, rtol=5e-3, atol=5e-3,
                                   err_msg=f"n={n}")
    # drop-in interface
    x2 = pcg_tridiag(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
                     jnp.asarray(b, jnp.float32))
    np.testing.assert_allclose(np.asarray(x2), x_ref, rtol=5e-3, atol=5e-3)


def test_pcg_with_extra_matvec(rng):
    """PCG over tridiag + a low-rank extra term (the STF-coupled use case)."""
    from hitl_slam_tpu.solver.cg import pcg_solve

    n = 40
    D, U, b = _random_spd_tridiag(rng, n)
    # extra: rank-deficient PSD coupling between poses 5 and 30
    J = np.zeros((2, 3 * n))
    J[0, 15:18] = [1.0, -0.5, 0.2]
    J[0, 90:93] = [-1.0, 0.5, -0.2]
    J[1, 16] = 0.7
    J[1, 91] = -0.7
    E = J.T @ J
    H = _dense(D, U) + E
    x_ref = np.linalg.solve(H, b.reshape(-1)).reshape(n, 3)
    Ej = jnp.asarray(E, jnp.float32)

    def extra(v):
        return (Ej @ v.reshape(-1)).reshape(n, 3)

    x, rel, it = jax.jit(
        lambda D_, U_, b_: pcg_solve(D_, U_, b_, extra_matvec=extra,
                                     tolerance=1e-7)
    )(jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
      jnp.asarray(b, jnp.float32))
    assert float(rel) < 1e-5
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=6e-3, atol=6e-3)


def test_pcg_tridiag_preconditioner(rng):
    """BCR-exact tridiagonal preconditioning: same solution as Jacobi, and
    when the tridiagonal part dominates, far fewer CG iterations (with no
    extra term it converges in O(1) iterations — M is exact)."""
    from hitl_slam_tpu.solver.cg import pcg_solve

    n = 64
    D, U, b = _random_spd_tridiag(rng, n)
    Dj = jnp.asarray(D, jnp.float32)
    Uj = jnp.asarray(U, jnp.float32)
    bj = jnp.asarray(b, jnp.float32)
    x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)

    x, rel, it = jax.jit(
        lambda D_, U_, b_: pcg_solve(D_, U_, b_, tolerance=1e-7,
                                     preconditioner="tridiag")
    )(Dj, Uj, bj)
    assert float(rel) < 1e-5
    assert int(it) <= 3   # exact preconditioner -> immediate convergence
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=5e-3, atol=5e-3)

    # with an extra coupling term both preconditioners must agree; tridiag
    # must not need more iterations than Jacobi
    J = np.zeros((2, 3 * n))
    J[0, 15:18] = [1.0, -0.5, 0.2]
    J[0, 90:93] = [-1.0, 0.5, -0.2]
    J[1, 16] = 0.7
    J[1, 91] = -0.7
    E = J.T @ J
    x_ref2 = np.linalg.solve(_dense(D, U) + E, b.reshape(-1)).reshape(n, 3)
    Ej = jnp.asarray(E, jnp.float32)

    def extra(v):
        return (Ej @ v.reshape(-1)).reshape(n, 3)

    its = {}
    for prec in ("jacobi", "tridiag"):
        x, rel, it = jax.jit(
            lambda D_, U_, b_, p=prec: pcg_solve(
                D_, U_, b_, extra_matvec=extra, tolerance=1e-7,
                preconditioner=p)
        )(Dj, Uj, bj)
        assert float(rel) < 1e-5, prec
        np.testing.assert_allclose(np.asarray(x), x_ref2, rtol=6e-3,
                                   atol=6e-3, err_msg=prec)
        its[prec] = int(it)
    assert its["tridiag"] <= its["jacobi"]


def test_lm_with_pcg_solver(rng):
    """LM accepts the CG path as a drop-in linear solver."""
    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.solver.cg import pcg_tridiag
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.lm import LMConfig, solve

    n = 40
    p = np.zeros((n, 3), np.float32)
    for i in range(1, n):
        p[i, 2] = p[i - 1, 2] + rng.normal(0, 0.1)
        p[i, :2] = p[i - 1, :2] + [0.4 * np.cos(p[i - 1, 2]),
                                   0.4 * np.sin(p[i - 1, 2])]
    t = ConstraintTable.empty(8)
    t = ConstraintTable(
        ctype=t.ctype.at[0].set(2),
        constrained=t.constrained.at[0].set(30),
        anchor=t.anchor.at[0].set(3),
        delta_parallel=t.delta_parallel.at[0].set(0.5),
        delta_perpendicular=t.delta_perpendicular.at[0].set(-0.2),
        delta_angle=t.delta_angle.at[0].set(0.1),
        penalty_dir=t.penalty_dir.at[0].set(0.0),
        active=t.active.at[0].set(True),
    )
    poses = jnp.asarray(p)
    prob = build_problem(poses, t)
    cfg = LMConfig(max_iterations=60)
    ref = jax.jit(lambda pr, x: solve(pr, x, cfg))(prob, poses)
    got = jax.jit(lambda pr, x: solve(pr, x, cfg, linear_solver=pcg_tridiag))(
        prob, poses)
    assert float(got.final_cost) <= float(ref.final_cost) * 1.05 + 1e-5


def test_pallas_bcr_matches_dense(rng):
    """solver/pallas_bcr.py (whole BCR as ONE kernel, interpret mode off
    TPU) must agree with the dense solution and with bcr_solve."""
    from hitl_slam_tpu.solver.pallas_bcr import bcr_solve_pallas

    for n in (2, 7, 33, 128, 300):
        D, U, b = _random_spd_tridiag(rng, n)
        x_ref = np.linalg.solve(_dense(D, U), b.reshape(-1)).reshape(n, 3)
        x = np.asarray(
            bcr_solve_pallas(jnp.asarray(D, jnp.float32),
                             jnp.asarray(U, jnp.float32),
                             jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(x, x_ref, rtol=5e-3, atol=5e-3)
        x_bcr = np.asarray(
            bcr_solve(jnp.asarray(D, jnp.float32),
                      jnp.asarray(U, jnp.float32),
                      jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(x, x_bcr, rtol=1e-4, atol=1e-5)


def test_lm_with_pallas_bcr_solver(rng):
    """lm.solve(linear_solver=bcr_solve_pallas) reaches the same cost in
    the same iterations as the XLA BCR default on a real joint problem."""
    import jax

    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.lm import LMConfig, solve
    from hitl_slam_tpu.solver.pallas_bcr import bcr_solve_pallas

    n = 64
    p = np.zeros((n, 3), np.float32)
    p[:, 2] = np.cumsum(rng.normal(0, 0.03, n)).astype(np.float32)
    for i in range(1, n):
        p[i, :2] = p[i - 1, :2] + [0.4 * np.cos(p[i - 1, 2]),
                                   0.4 * np.sin(p[i - 1, 2])]
    t = ConstraintTable.empty(8)
    t = ConstraintTable(
        ctype=t.ctype.at[0].set(2),
        constrained=t.constrained.at[0].set(30),
        anchor=t.anchor.at[0].set(3),
        delta_parallel=t.delta_parallel.at[0].set(0.5),
        delta_perpendicular=t.delta_perpendicular.at[0].set(-0.2),
        delta_angle=t.delta_angle.at[0].set(0.1),
        penalty_dir=t.penalty_dir.at[0].set(0.0),
        active=t.active.at[0].set(True),
    )
    poses = jnp.asarray(p)
    prob = build_problem(poses, t)
    cfg = LMConfig(max_iterations=40)
    ref = jax.jit(lambda pr, x: solve(pr, x, cfg))(prob, poses)
    got = jax.jit(lambda pr, x: solve(pr, x, cfg,
                                      linear_solver=bcr_solve_pallas))(
        prob, poses)
    assert int(got.iterations) == int(ref.iterations)
    np.testing.assert_allclose(float(got.final_cost),
                               float(ref.final_cost), rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.poses), np.asarray(ref.poses),
                               rtol=1e-4, atol=1e-5)


def test_default_solver_vmem_gate(monkeypatch):
    """The Pallas whole-solve kernel exceeds this target's 16 MB scoped-vmem
    limit above 4096 poses (measured 22.99 MB at P=8192, round 5 — the
    failure silently zeroed every large-pose TPU surface in the round-4
    driver bench). The default-solver selection must route large pose
    counts to the XLA-op BCR and honor the escape hatch."""
    from hitl_slam_tpu.solver.lm import (_PALLAS_BCR_MAX_POSES,
                                         _default_linear_solver)
    from hitl_slam_tpu.solver.pallas_bcr import bcr_solve_pallas
    from hitl_slam_tpu.solver.tridiag import bcr_solve

    monkeypatch.delenv("HITL_NO_PALLAS_BCR", raising=False)
    assert _default_linear_solver("tpu", 1024) is bcr_solve_pallas
    assert _default_linear_solver("tpu", _PALLAS_BCR_MAX_POSES) \
        is bcr_solve_pallas
    assert _default_linear_solver("tpu", _PALLAS_BCR_MAX_POSES + 1) \
        is bcr_solve
    assert _default_linear_solver("tpu", 8192) is bcr_solve
    assert _default_linear_solver("tpu", 16384) is bcr_solve
    assert _default_linear_solver("cpu", 64) is bcr_solve
    monkeypatch.setenv("HITL_NO_PALLAS_BCR", "1")
    assert _default_linear_solver("tpu", 1024) is bcr_solve
