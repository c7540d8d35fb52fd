"""LTVM: SDF builder, RANSAC extraction, curator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hitl_slam_tpu.core.state import make_map_state
from hitl_slam_tpu.io.figure8 import generate_figure8
from hitl_slam_tpu.models.ltvm.curator import CuratorParams, LongTermVectorMap
from hitl_slam_tpu.ops.ransac import RansacParams, extract_segments
from hitl_slam_tpu.ops.sdf import SdfParams, build_sdf, dynamic_mask

# heavy tier: excluded from the smoke run (-m 'not full', README Testing)
pytestmark = pytest.mark.full


@pytest.fixture(scope="module")
def clean_map():
    # use ground-truth poses: the curator's input maps are repaired maps
    m = generate_figure8(num_poses=72, num_rays=160, seed=2,
                        drift_theta_bias=0.0, noise_trans=0.0, noise_theta=0.0)
    st = make_map_state(m.gt_poses, m.covariances, m.point_clouds,
                        m.normal_clouds)
    return m, st


def test_sdf_zero_on_walls(clean_map):
    m, st = clean_map
    params = SdfParams(image_resolution=0.1)
    origin = jnp.asarray([-21.0, -1.0])
    sdf = build_sdf(st.poses, st.points, st.point_mask, origin,
                    height=120, width=420, params=params)
    v = np.asarray(sdf.values)
    w = np.asarray(sdf.weights)
    assert np.isfinite(v).all() and (w >= 0).all()
    # pixels on the bottom wall (y=0): |sdf| should be small where observed
    row = int((0.0 - (-1.0)) / 0.1)
    wall_vals = v[row, 30:390][w[row, 30:390] > 0.5]
    assert len(wall_vals) > 50
    assert np.median(np.abs(wall_vals)) < 0.08
    # free space in front of walls has positive sdf
    mid_row = int((2.0 + 1.0) / 0.1)
    free_vals = v[mid_row, 100:300][w[mid_row, 100:300] > 0.5]
    assert np.median(free_vals) > 0.05
    # NEVER-OBSERVED pixels read min_sdf_value ('behind surface'), not 0
    # ('at surface') — review r3: the init value was destroyed by the
    # first zero-weight accumulator update
    unobs = v[w == 0]
    assert len(unobs) > 0
    np.testing.assert_allclose(unobs, params.min_sdf_value, atol=1e-6)
    # dynamic mask keeps some and rejects some
    dm = np.asarray(dynamic_mask(sdf, params))
    assert 0 < dm.sum() < dm.size


def test_ransac_recovers_lines(rng):
    # three segments + noise + outliers
    t = np.linspace(0, 1, 150)
    seg1 = np.stack([t * 8.0, np.zeros_like(t)], -1)
    seg2 = np.stack([np.zeros_like(t), t * 5.0], -1)
    seg3 = np.stack([t * 6.0 + 2.0, np.full_like(t, 7.0)], -1)
    pts = np.concatenate([seg1, seg2, seg3], 0)
    pts += rng.normal(0, 0.01, pts.shape)
    outliers = rng.uniform(-1, 9, (60, 2))
    pts = np.concatenate([pts, outliers], 0).astype(np.float32)
    mask = np.ones(len(pts), bool)

    segs = extract_segments(
        jnp.asarray(pts), jnp.asarray(mask), jax.random.PRNGKey(0),
        RansacParams(num_segments=8, inlier_threshold=0.05, min_inliers=40),
    )
    valid = np.asarray(segs.valid)
    assert valid.sum() >= 3
    lengths = np.linalg.norm(
        np.asarray(segs.p2) - np.asarray(segs.p1), axis=1)[valid]
    # recovered lengths ~ 8, 5, 6 (any order)
    assert sorted(lengths[:3])[-1] > 6.0


def test_curator_end_to_end(clean_map, tmp_path):
    m, st = clean_map
    params = CuratorParams()
    params.sdf = SdfParams(image_resolution=0.1)
    params.ransac = RansacParams(num_segments=24, inlier_threshold=0.08,
                                 min_inliers=30, min_length=1.0)
    cur = LongTermVectorMap(params)
    vectors = cur.curate(st.poses, st.points, st.point_mask)
    assert len(vectors) >= 4   # the figure-8 has 6 walls
    total_len = sum(np.linalg.norm(v.p2 - v.p1) for v in vectors)
    assert total_len > 50.0    # walls total ~100m; partial visibility ok
    for v in vectors:
        assert v.mass >= params.prune_min_mass
        assert np.isfinite(v.endpoint_cov).all()

    # idempotence-ish: curating the same data again should not balloon the map
    n1 = len(vectors)
    vectors2 = cur.curate(st.poses, st.points, st.point_mask)
    assert len(vectors2) <= n1 + 3

    cur.save_sdf(str(tmp_path / "w.png"), str(tmp_path / "v.png"))
    cur.save_vectors(str(tmp_path / "vectors.txt"))
    assert (tmp_path / "vectors.txt").read_text().count("\n") == len(vectors2)
