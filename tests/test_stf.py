"""STF correspondence engine + post-human refinement tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.ops import correspond as C

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


def _two_pose_cloud(rng, n=64, offset=0.05):
    """Two poses observing the same wall, slightly offset."""
    x = np.linspace(0.0, 3.0, n)
    pts0 = np.stack([x, np.zeros(n)], -1).astype(np.float32)
    pts1 = pts0 + np.array([0.0, offset], np.float32)
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    world = jnp.asarray(np.stack([pts0, pts1]))          # [2, n, 2]
    normals = jnp.asarray(np.stack([nrm, nrm]))
    mask = jnp.ones((2, n), bool)
    return world, normals, mask


def test_grid_match_vs_bruteforce(rng):
    P, N = 4, 48
    pts = rng.uniform(0, 4.0, (P, N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (P, N))
    nrm = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    mask = rng.uniform(size=(P, N)) > 0.1
    m = C.grid_match(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
                     threshold=0.3)

    flat = pts.reshape(-1, 2)
    fnrm = nrm.reshape(-1, 2)
    fmask = mask.reshape(-1)
    pose = np.repeat(np.arange(P), N)
    min_cos = float(np.cos(25 * np.pi / 180))
    got_t = np.asarray(m.target)
    got_v = np.asarray(m.valid)
    for i in range(P * N):
        if not fmask[i]:
            assert not got_v[i]
            continue
        d2 = np.sum((flat - flat[i]) ** 2, -1)
        cos = fnrm @ fnrm[i]
        ok = fmask & (pose != pose[i]) & (d2 < 0.09) & (cos > min_cos)
        if not ok.any():
            assert not got_v[i], i
        else:
            assert got_v[i], i
            expect = np.flatnonzero(ok)[np.argmin(d2[ok])]
            assert got_t[i] == expect, (i, got_t[i], expect)
    assert int(m.dropped) == 0


def test_grid_match_near_coincident_dist_finite(rng):
    """The matmul-expanded distance can round negative for near-coincident
    cross-pose points; Matches.dist must stay finite (was NaN)."""
    n = 48
    x = np.linspace(0.0, 2.0, n)
    base = np.stack([x, np.zeros(n)], -1).astype(np.float32)
    jit_ = rng.normal(0, 2e-6, (n, 2)).astype(np.float32)
    pts = jnp.asarray(np.stack([base, base + jit_]))
    nrm = jnp.asarray(np.tile(np.array([[0.0, 1.0]], np.float32),
                              (2, n, 1)))
    m = C.grid_match(pts, nrm, jnp.ones((2, n), bool))
    assert bool(m.valid.any())
    d = np.asarray(m.dist)
    assert np.isfinite(d[np.asarray(m.valid)]).all()


def test_grid_match_density_cap_counts_dropped(rng):
    """Cells holding more than `bucket` points density-cap the excess and
    report it in Matches.dropped; surviving points still match exactly."""
    n = 96
    pts = rng.uniform(0, 0.05, (2, n, 2)).astype(np.float32)  # ONE cell
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (2, n, 1))
    mask = np.ones((2, n), bool)
    m = C.grid_match(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
                     threshold=0.15, bucket=64)
    # 192 points in one cell, 64 kept
    assert int(m.dropped) == 192 - 64
    # kept points all have a cross-pose neighbor within range
    assert int(jnp.sum(m.valid)) > 0
    v = np.asarray(m.valid)
    t = np.asarray(m.target)
    pose = np.repeat(np.arange(2), n)
    flat = pts.reshape(-1, 2)
    for i in np.flatnonzero(v):
        assert pose[t[i]] != pose[i]
        assert np.sum((flat[t[i]] - flat[i]) ** 2) < 0.15**2


def test_grid_match_out_of_span_points_masked(rng):
    """Points beyond the grid span (~2.4 km at the 0.15 m cell) are dropped
    and counted, NOT aliased into border cells (ADVICE r2)."""
    n = 8
    pts = np.zeros((2, n, 2), np.float32)
    pts[0, :, 0] = np.linspace(0, 0.5, n)
    # far-out points that would alias into the same border cell if clipped
    pts[1, :, 0] = 3000.0 + np.linspace(0, 0.01, n)
    pts[1, :2, 0] = -5000.0
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (2, n, 1))
    mask = np.ones((2, n), bool)
    m = C.grid_match(jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
                     threshold=0.15)
    assert int(m.dropped) == n          # all of pose 1 is out of span
    assert not np.any(np.asarray(m.valid))   # no spurious cross-pose matches


def test_segmented_pair_sums_large_capacity_precision(rng):
    """The blocked segmented cumsum keeps per-run error LOCAL: at the full
    65536-row capacity with realistic STF-product magnitudes, small late
    runs must not lose digits to the global prefix (ADVICE r2 — the plain
    cumsum-difference loses ~global_magnitude*eps)."""
    from hitl_slam_tpu.solver.stf_solve import _segmented_pair_sums

    Cn = 65536
    # realistic magnitudes: STF weights ~ (1/40/0.05)/sqrt(n) ~ 0.5,
    # products ~ 0.25; all-positive worst case grows the global prefix
    X = rng.uniform(0.1, 0.5, (Cn, 9)).astype(np.float32)
    # run structure: mostly medium runs, with tiny 2-row runs at the tail
    # (the dangerous case: small pair sums against a ~16k global prefix)
    bounds = [0]
    i = 0
    while i < Cn - 256:
        i += int(rng.integers(8, 200))
        bounds.append(min(i, Cn - 256))
    i = Cn - 256
    while i < Cn:
        bounds.append(i)
        i += 2
    bounds = np.unique(np.asarray(bounds + [Cn]))
    run_start = np.zeros(Cn, np.int32)
    for s, e in zip(bounds[:-1], bounds[1:]):
        run_start[s:e] = s
    got = np.asarray(_segmented_pair_sums(
        jnp.asarray(X), jnp.asarray(run_start)))
    cs64 = np.cumsum(X.astype(np.float64), axis=0)
    pos = np.arange(Cn)
    a = run_start - 1
    want = cs64[pos] - np.where((a >= 0)[:, None], cs64[np.maximum(a, 0)], 0)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    # small late runs: magnitude ~0.5, global prefix ~16k -> plain cumsum
    # error would be ~16k*eps/0.5 ~ 4e-3 relative; blocked stays ~1e-5
    assert float(rel.max()) < 5e-4, float(rel.max())


def test_stf_jacobians_match_autodiff(rng):
    world, normals, mask = _two_pose_cloud(rng)
    poses = jnp.asarray(
        np.array([[0, 0, 0], [0.1, -0.02, 0.03]], np.float32))
    # robot-frame = world here for pose0 identity; build factors directly
    m = C.grid_match(world, normals, mask, threshold=0.2)
    f = C.build_stf_factors(world, normals, m, capacity=256,
                            min_pair_matches=5)
    assert int(jnp.sum(f.valid)) > 50

    r = C.stf_residuals(f, poses)
    J0, J1 = C.stf_jacobians(f, poses)

    def r_fn(flat):
        return C.stf_residuals(f, flat.reshape(2, 3)).reshape(-1)

    Jfull = jax.jit(jax.jacfwd(r_fn))(poses.reshape(-1))  # [2C, 6]
    Cn = f.pose0.shape[0]
    Jfull = np.asarray(Jfull).reshape(Cn, 2, 6)
    p0 = np.asarray(f.pose0)
    p1 = np.asarray(f.pose1)
    va = np.asarray(f.valid)
    for k in np.flatnonzero(va)[:40]:
        np.testing.assert_allclose(
            Jfull[k][:, 3 * p0[k]: 3 * p0[k] + 3], np.asarray(J0[k]),
            atol=1e-4, err_msg=f"J0 {k}")
        np.testing.assert_allclose(
            Jfull[k][:, 3 * p1[k]: 3 * p1[k] + 3], np.asarray(J1[k]),
            atol=1e-4, err_msg=f"J1 {k}")


def test_stf_scalar_products_match_aos(rng):
    """The SoA scalar-lane products driving the dense-refine assembly must
    reproduce the AoS J^T J / J^T r blocks (solver/stf_solve.py)."""
    from hitl_slam_tpu.solver.stf_solve import _stf_scalar_products

    world, normals, mask = _two_pose_cloud(rng)
    poses = jnp.asarray(
        np.array([[0.02, -0.01, 0.01], [0.1, -0.02, 0.03]], np.float32))
    m = C.grid_match(world, normals, mask, threshold=0.2)
    f = C.build_stf_factors(world, normals, m, capacity=256,
                            min_pair_matches=5)
    r = np.asarray(C.stf_residuals(f, poses))
    J0, J1 = map(np.asarray, C.stf_jacobians(f, poses))
    X0, X1, X2, sq = map(np.asarray, _stf_scalar_products(f, poses))
    Cn = f.pose0.shape[0]
    J0T = np.swapaxes(J0, -1, -2)
    J1T = np.swapaxes(J1, -1, -2)
    np.testing.assert_allclose(X0[:, :9], (J0T @ J0).reshape(Cn, 9),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(X1[:, :9], (J1T @ J1).reshape(Cn, 9),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(X2, (J0T @ J1).reshape(Cn, 9),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(X0[:, 9:], (J0T @ r[..., None])[..., 0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(X1[:, 9:], (J1T @ r[..., None])[..., 0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(sq, np.sum(r * r, -1), rtol=1e-5, atol=1e-6)


def test_pair_sorted_assembly_matches_plain(rng):
    """assemble_dense with pair_runs (sorted table, cumsum off-diag,
    collision-free scatter) == assemble_dense with the plain scatter."""
    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.solver.joint import build_problem
    from hitl_slam_tpu.solver.stf_solve import (assemble_dense,
                                                sort_factors_by_pair,
                                                stf_onehots)

    world, normals, mask = _two_pose_cloud(rng)
    poses = jnp.asarray(
        np.array([[0, 0, 0], [0.1, -0.02, 0.03]], np.float32))
    m = C.grid_match(world, normals, mask, threshold=0.2)
    f = C.build_stf_factors(world, normals, m, capacity=256,
                            min_pair_matches=5)
    prob = build_problem(poses, ConstraintTable.empty(4))
    oh = stf_onehots(f, 2, jnp.float32)
    H_a, g_a, c_a = assemble_dense(prob, f, poses, True, oh)
    fs, run_last, run_start = sort_factors_by_pair(f, 2)
    oh_s = stf_onehots(fs, 2, jnp.float32)
    H_b, g_b, c_b = assemble_dense(prob, fs, poses, True, oh_s,
                                   (run_last, run_start))
    np.testing.assert_allclose(np.asarray(H_b), np.asarray(H_a),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(c_b), float(c_a), rtol=1e-5)

    # compacted pair-representative path (gather + unique scatter-SET)
    from hitl_slam_tpu.solver.stf_solve import compact_pair_rows

    cidx, cbi, cbj, dropped = compact_pair_rows(fs, run_last, 2, max_pairs=8)
    assert int(dropped) == 0
    H_c, g_c, c_c = assemble_dense(prob, fs, poses, True, oh_s,
                                   (run_last, run_start), (cidx, cbi, cbj))
    np.testing.assert_allclose(np.asarray(H_c), np.asarray(H_b),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_b),
                               rtol=1e-6, atol=1e-6)

    # capacity 1 < #pairs: the overflow is COUNTED, not silent
    cidx1, cbi1, cbj1, dropped1 = compact_pair_rows(fs, run_last, 2,
                                                    max_pairs=1)
    assert int(dropped1) == int(jnp.sum(run_last)) - 1


def test_refine_aligns_offset_wall(rng):
    """Two scans of one wall, offset 5 cm: the STF refine should pull the
    second pose to close the gap."""
    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.models.hitl.refine import post_human_refine
    from hitl_slam_tpu.solver.lm import LMConfig

    n = 64
    x = np.linspace(0.0, 3.0, n)
    wall = np.stack([x, np.zeros(n)], -1).astype(np.float32)
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    # both poses at origin-ish; pose1's estimate is off by +5 cm in y
    points = jnp.asarray(np.stack([wall, wall]))
    normals = jnp.asarray(np.stack([nrm, nrm]))
    mask = jnp.ones((2, n), bool)
    poses = jnp.asarray(np.array([[0, 0, 0], [0.0, 0.05, 0.0]], np.float32))
    table = ConstraintTable.empty(8)

    out = post_human_refine(points, normals, mask, poses, table,
                            capacity=512, config=LMConfig(max_iterations=20))
    assert int(out.num_matches) > 50
    # the matcher's density-cap/out-of-range drop count is surfaced on the
    # refine result (ADVICE r2: capacity violations must be detectable)
    assert int(out.match_dropped) == 0
    assert float(out.final_cost) < float(out.initial_cost)
    # pose1's y should shrink toward 0 (the odometry chain resists some)
    y1 = float(out.poses[1, 1])
    assert abs(y1) < 0.05, y1


def _random_factors(rng, P=6, Cn=96):
    """Random valid-masked STFFactors over P poses with unit normals and
    pose0 < pose1 (the pair-sorted invariant's input form)."""
    pose0 = rng.integers(0, P - 1, Cn).astype(np.int32)
    pose1 = (pose0 + 1 + rng.integers(0, P - 1, Cn) % (P - 1 - pose0
             ).clip(min=1)).clip(max=P - 1).astype(np.int32)
    ang0 = rng.uniform(0, 2 * np.pi, Cn)
    ang1 = rng.uniform(0, 2 * np.pi, Cn)
    return C.STFFactors(
        pose0=jnp.asarray(pose0), pose1=jnp.asarray(pose1),
        p0=jnp.asarray(rng.uniform(-2, 2, (Cn, 2)).astype(np.float32)),
        p1=jnp.asarray(rng.uniform(-2, 2, (Cn, 2)).astype(np.float32)),
        n0=jnp.asarray(np.stack([np.cos(ang0), np.sin(ang0)],
                                -1).astype(np.float32)),
        n1=jnp.asarray(np.stack([np.cos(ang1), np.sin(ang1)],
                                -1).astype(np.float32)),
        weight=jnp.asarray(rng.uniform(0.5, 2.0, Cn).astype(np.float32)),
        valid=jnp.asarray(rng.uniform(size=Cn) > 0.2),
    )


def test_pcg_compact_system_matches_bruteforce(rng):
    """_stf_system_compact (segmented sums + unique scatters) and
    _pair_block_matvec reproduce the brute-force scattered STF Hessian
    action exactly (up to fp association)."""
    from hitl_slam_tpu.solver.stf_solve import (
        _pair_block_matvec, _pcg_reductions, _stf_system_compact,
        compact_pair_rows, sort_factors_by_pair)

    P, Cn = 6, 96
    stf = _random_factors(rng, P, Cn)
    poses = jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32))

    stf_s, run_last, run_start = sort_factors_by_pair(stf, P)
    pc = compact_pair_rows(stf_s, run_last, P)
    assert int(pc[3]) == 0
    red = _pcg_reductions(stf_s, run_start, pc[:3], P)
    Dh, g, cost, B = _stf_system_compact(stf_s, poses, red)

    # brute-force reference from residual/jacobian scatters
    r = C.stf_residuals(stf, poses)
    J0, J1 = C.stf_jacobians(stf, poses)
    J0T, J1T = jnp.swapaxes(J0, -1, -2), jnp.swapaxes(J1, -1, -2)
    Dref = jnp.zeros((P, 3, 3)).at[stf.pose0].add(J0T @ J0)
    Dref = Dref.at[stf.pose1].add(J1T @ J1).at[0].set(0.0)
    gref = jnp.zeros((P, 3)).at[stf.pose0].add((J0T @ r[..., None])[..., 0])
    gref = gref.at[stf.pose1].add((J1T @ r[..., None])[..., 0]).at[0].set(0.0)
    np.testing.assert_allclose(np.asarray(Dh), np.asarray(Dref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(cost), float(0.5 * jnp.sum(r * r)),
                               rtol=1e-5)

    # off-diagonal action vs brute-force factor scatters
    v = jnp.asarray(rng.uniform(-1, 1, (P, 3)).astype(np.float32))
    got = _pair_block_matvec(B, red, P)(v)
    vz = v.at[0].set(0.0)
    a = J0T @ (J1 @ vz[stf.pose1][..., None])
    b = J1T @ (J0 @ vz[stf.pose0][..., None])
    ref = jnp.zeros((P, 3)).at[stf.pose0].add(a[..., 0])
    ref = ref.at[stf.pose1].add(b[..., 0]).at[0].set(0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pair_match_factors_vs_bruteforce(rng):
    """pair_match_factors' per-pair dense NN equals a numpy per-pair
    KD-query loop (the reference FindSTFCorrespondences semantics) on the
    elected pairs."""
    P, N = 5, 24
    pts = rng.uniform(0, 2.0, (P, N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (P, N))
    nrm = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    mask = rng.uniform(size=(P, N)) > 0.15
    poses = rng.uniform(-0.05, 0.05, (P, 3)).astype(np.float32)
    f, info = C.pair_match_factors(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
        jnp.asarray(poses), max_pairs=16, capacity=512, pair_chunk=8,
        min_pair_matches=2, threshold=0.5)

    # world-frame numpy mirror
    def to_world(q, p):
        c, s = np.cos(q[2]), np.sin(q[2])
        R = np.array([[c, -s], [s, c]], np.float32)
        return p @ R.T + q[:2]

    wp = np.stack([to_world(poses[i], pts[i]) for i in range(P)])
    wn = np.stack([to_world(poses[i], nrm[i]) - poses[i][:2]
                   for i in range(P)])
    min_cos = float(np.cos(25 * np.pi / 180))
    got = {}
    fv = np.asarray(f.valid)
    for r in range(int(fv.sum())):
        key = (int(f.pose0[r]), int(f.pose1[r]))
        got.setdefault(key, []).append(
            (np.asarray(f.p0[r]), np.asarray(f.p1[r])))
    assert got, "no factors emitted"
    for (i, j), rows in got.items():
        assert i < j
        # every emitted row is the brute-force per-pair NN of its source
        for p0r, p1r in rows:
            si = np.argmin(np.sum((pts[i] - p0r) ** 2, -1))
            d2 = np.sum((wp[j] - wp[i][si]) ** 2, -1)
            cos = wn[j] @ wn[i][si]
            ok = mask[j] & mask[i][si] & (d2 < 0.25) & (cos > min_cos)
            assert ok.any()
            expect = np.flatnonzero(ok)[np.argmin(d2[ok])]
            np.testing.assert_allclose(p1r, pts[j][expect], atol=1e-6)
        # and the bundle is COMPLETE: one row per in-gate source point
        n_expect = 0
        for si in range(N):
            if not mask[i][si]:
                continue
            d2 = np.sum((wp[j] - wp[i][si]) ** 2, -1)
            cos = wn[j] @ wn[i][si]
            if (mask[j] & (d2 < 0.25) & (cos > min_cos)).any():
                n_expect += 1
        assert len(rows) == n_expect, (i, j, len(rows), n_expect)


def test_pair_matcher_rescues_fragmented_map():
    """On a heavily re-traversed map the global 1-NN fragments bundles
    below the reference's >=10-per-pair gate (zero factors); the per-pair
    matcher (reference FindSTFCorrespondences semantics) recovers healthy
    bundles and the refine reduces cost."""
    from hitl_slam_tpu.core.state import make_map_state
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.refine import post_human_refine
    from hitl_slam_tpu.ops.geometry import pose_to_world, rotate
    from hitl_slam_tpu.solver.lm import LMConfig

    m = generate_figure8(num_poses=512, num_rays=40, seed=13,
                         drift_theta_bias=2e-4, num_laps=8)
    st = make_map_state(m.poses, m.covariances, m.point_clouds,
                        m.normal_clouds, odometry=m.odometry,
                        constraint_capacity=64)
    world = pose_to_world(st.poses[:, None, :], st.points)
    wn = rotate(st.poses[:, 2][:, None], st.normals)
    mt = C.grid_match(world, wn, st.point_mask)
    stf_g = C.build_stf_factors(st.points, st.normals, mt, capacity=16384)
    assert int(stf_g.valid.sum()) == 0          # the failure mode is real

    f, info = C.pair_match_factors(st.points, st.normals, st.point_mask,
                                   st.poses, max_pairs=8192, capacity=32768)
    assert int(info.n_pairs) > 500
    assert int(info.n_matches) > 10000
    assert int(info.rows_overflow) == 0
    assert int(info.pairs_overflow) == 0

    out = post_human_refine(st.points, st.normals, st.point_mask, st.poses,
                            st.constraints, capacity=32768,
                            config=LMConfig(max_iterations=3),
                            matcher="pair", max_pairs=8192)
    assert int(out.num_matches) > 10000
    assert float(out.final_cost) < float(out.initial_cost)
    assert np.isfinite(np.asarray(out.poses)).all()


def test_pair_match_factors_edge_cases(rng):
    """Empty masks yield zero pairs/factors; an election capacity smaller
    than the voted pair count is COUNTED in pairs_overflow, not silent."""
    P, N = 4, 16
    pts = rng.uniform(0, 1.0, (P, N, 2)).astype(np.float32)
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (P, N, 1))
    poses = np.zeros((P, 3), np.float32)

    # all points masked out
    f0, info0 = C.pair_match_factors(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.zeros((P, N), bool),
        jnp.asarray(poses), max_pairs=8, capacity=64, pair_chunk=4,
        min_pair_matches=1, threshold=0.5)
    assert int(info0.n_pairs) == 0
    assert int(info0.n_matches) == 0
    assert not bool(f0.valid.any())

    # full mask: every distinct pose pair votes; max_pairs=2 < voted pairs
    f1, info1 = C.pair_match_factors(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.ones((P, N), bool),
        jnp.asarray(poses), max_pairs=2, capacity=64, pair_chunk=2,
        min_pair_matches=1, threshold=2.0)
    assert int(info1.pairs_overflow) > 0
    assert int(info1.n_pairs) <= 2
    assert int(f1.valid.sum()) == int(min(info1.n_matches, 64))

    # tiny map with DEFAULT election capacity: P*N < max_pairs must not
    # crash top_k (k is clamped to the vote-array size)
    f2, info2 = C.pair_match_factors(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.ones((P, N), bool),
        jnp.asarray(poses), capacity=64, pair_chunk=8,
        min_pair_matches=1, threshold=2.0)
    assert int(info2.n_pairs) > 0
    assert int(info2.pairs_overflow) == 0


def test_pair_match_elect_impls_agree(rng):
    """The argsort election (kept as a TPU alternative to lax.top_k)
    selects the identical pair set — both break vote ties by lowest
    index (argsort is stable), so the emitted factor tables are
    bit-equal, including under election overflow."""
    P, N = 6, 24
    pts = rng.uniform(0, 2.0, (P, N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (P, N))
    nrm = np.stack([np.cos(ang), np.sin(ang)], -1).astype(np.float32)
    mask = rng.uniform(size=(P, N)) > 0.15
    poses = rng.uniform(-0.05, 0.05, (P, 3)).astype(np.float32)
    for max_pairs in (4, 32):   # overflow + headroom
        outs = [C.pair_match_factors(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(mask),
            jnp.asarray(poses), max_pairs=max_pairs, capacity=512,
            pair_chunk=8, min_pair_matches=2, threshold=0.5,
            elect_impl=impl) for impl in ("top_k", "argsort")]
        (fa, ia), (fb, ib) = outs
        assert int(ia.n_pairs) == int(ib.n_pairs)
        assert int(ia.n_matches) == int(ib.n_matches)
        assert int(ia.pairs_overflow) == int(ib.pairs_overflow)
        for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(fa),
                                  jax.tree_util.tree_leaves(fb)):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_b))


def test_cpu_refine_baseline_matches_tpu_path(rng):
    """baselines/cpu_refine (f64 LAPACK dense LM, the optimized-CPU bound
    for the net-new refine stage) converges to the same solution as the
    f32 TPU-path dense solve on the same factor graph."""
    from hitl_slam_tpu.baselines.cpu_refine import (cpu_refine_solve,
                                                    stf_to_numpy)
    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.ops.geometry import pose_to_world, rotate
    from hitl_slam_tpu.solver.lm import LMConfig
    from hitl_slam_tpu.solver.stf_solve import stf_lm_solve

    n = 64
    x = np.linspace(0.0, 3.0, n)
    wall = np.stack([x, np.zeros(n)], -1).astype(np.float32)
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    points = jnp.asarray(np.stack([wall, wall]))
    normals = jnp.asarray(np.stack([nrm, nrm]))
    mask = jnp.ones((2, n), bool)
    poses = jnp.asarray(np.array([[0, 0, 0], [0.0, 0.05, 0.0]], np.float32))
    table = ConstraintTable.empty(8)
    world = pose_to_world(poses[:, None, :], points)
    wn = rotate(poses[:, 2][:, None], normals)
    mt = C.grid_match(world, wn, mask)
    stf = C.build_stf_factors(points, normals, mt, capacity=512)

    out = stf_lm_solve(poses, table, stf, config=LMConfig(max_iterations=20))
    np_table = dict(
        ctype=np.asarray(table.ctype), constrained=np.asarray(
            table.constrained), anchor=np.asarray(table.anchor),
        dpar=np.asarray(table.delta_parallel),
        dperp=np.asarray(table.delta_perpendicular),
        dth=np.asarray(table.delta_angle), pen=np.asarray(table.penalty_dir),
        active=np.asarray(table.active))
    cpu_poses, cpu_cost, cpu_iters = cpu_refine_solve(
        np.asarray(poses), np_table, stf_to_numpy(stf), max_iterations=20)
    assert cpu_iters > 0
    np.testing.assert_allclose(float(out.final_cost), cpu_cost,
                               rtol=2e-3, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.poses), cpu_poses,
                               atol=2e-4)


def test_post_optimize_auto_matcher_fallback():
    """engine.post_optimize(matcher='auto') falls back to the per-pair
    matcher when the global 1-NN yields zero gated bundles."""
    from hitl_slam_tpu.io.figure8 import generate_figure8
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    m = generate_figure8(num_poses=512, num_rays=40, seed=13,
                         drift_theta_bias=2e-4, num_laps=8)
    eng = HitLSLAM()
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             odometry=m.odometry, constraint_capacity=64)
    rep = eng.post_optimize(max_iterations=3)
    assert rep.accepted
    assert "pair matcher" in rep.reason
    assert rep.final_cost < rep.initial_cost
    assert np.isfinite(np.asarray(eng.get_poses())).all()


def test_refine_dense_fused_matches_dense(rng):
    """solver='dense_fused' (one factor pass per LM iteration, trial cost
    from the assembly) converges to the same refinement as the two-pass
    dense default — same cost math, different evaluation schedule."""
    from hitl_slam_tpu.core.state import ConstraintTable
    from hitl_slam_tpu.models.hitl.refine import post_human_refine
    from hitl_slam_tpu.solver.lm import LMConfig

    n = 64
    x = np.linspace(0.0, 3.0, n)
    wall = np.stack([x, np.zeros(n)], -1).astype(np.float32)
    nrm = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))
    points = jnp.asarray(np.stack([wall, wall]))
    normals = jnp.asarray(np.stack([nrm, nrm]))
    mask = jnp.ones((2, n), bool)
    poses = jnp.asarray(np.array([[0, 0, 0], [0.0, 0.05, 0.0]], np.float32))
    table = ConstraintTable.empty(8)
    cfg = LMConfig(max_iterations=20)

    out_d = post_human_refine(points, normals, mask, poses, table,
                              capacity=512, config=cfg, solver="dense")
    out_f = post_human_refine(points, normals, mask, poses, table,
                              capacity=512, config=cfg, solver="dense_fused")
    np.testing.assert_allclose(np.asarray(out_f.initial_cost),
                               np.asarray(out_d.initial_cost), rtol=1e-5)
    assert float(out_f.final_cost) < float(out_f.initial_cost)
    # identical accept/reject path up to fp association differences in the
    # cost reduction -> same pose fix to tight tolerance
    np.testing.assert_allclose(np.asarray(out_f.poses),
                               np.asarray(out_d.poses), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_f.final_cost),
                               np.asarray(out_d.final_cost), rtol=1e-3)


def test_post_optimize_on_session(small_map):
    from hitl_slam_tpu.models.hitl.engine import HitLSLAM

    eng = HitLSLAM()
    m = small_map
    eng.init(m.poses, m.covariances, m.point_clouds, m.normal_clouds,
             constraint_capacity=256)
    rep = eng.post_optimize(max_iterations=10)
    assert rep.accepted
    # engine forwards the matcher drop count as CycleReport.dropped_rows
    assert rep.dropped_rows == 0
    poses = eng.get_poses()
    assert np.isfinite(poses).all()
    assert rep.final_cost <= rep.initial_cost * 1.0 + 1e-6


def test_pcg_refine_matches_dense(small_map):
    """The matrix-free PCG refine (the P>2k path that never materializes a
    [3P,3P] Hessian) must reproduce the dense-solver result."""
    from hitl_slam_tpu.core.state import ConstraintTable, make_map_state
    from hitl_slam_tpu.models.hitl.refine import post_human_refine
    from hitl_slam_tpu.solver.lm import LMConfig

    m = small_map
    st = make_map_state(m.poses, m.covariances, m.point_clouds,
                        m.normal_clouds, constraint_capacity=64)
    cfg = LMConfig(max_iterations=12)
    dense = post_human_refine(st.points, st.normals, st.point_mask, st.poses,
                              st.constraints, capacity=8192, config=cfg,
                              solver="dense")
    pcg = post_human_refine(st.points, st.normals, st.point_mask, st.poses,
                            st.constraints, capacity=8192, config=cfg,
                            solver="pcg")
    assert int(dense.num_matches) == int(pcg.num_matches) > 0
    # same optimum (different linear solvers, same normal equations)
    np.testing.assert_allclose(np.asarray(pcg.poses), np.asarray(dense.poses),
                               atol=2e-3)
    assert float(pcg.final_cost) <= float(dense.final_cost) * 1.05 + 1e-6
    # gauge: pose 0 untouched by both
    np.testing.assert_allclose(np.asarray(pcg.poses[0]),
                               np.asarray(st.poses[0]), atol=1e-6)
