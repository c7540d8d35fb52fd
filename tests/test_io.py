import numpy as np

from hitl_slam_tpu.core.state import CorrectionType, SingleInput, make_map_state
from hitl_slam_tpu.io import logs, stfs
from hitl_slam_tpu.io.figure8 import generate_figure8


def test_figure8_shapes():
    m = generate_figure8(num_poses=64, num_rays=60)
    assert m.poses.shape == (64, 3)
    assert m.covariances.shape == (64, 3, 3)
    assert len(m.point_clouds) == 64
    assert all(pc.shape[1] == 2 for pc in m.point_clouds)
    # drift: later poses diverge from ground truth
    err = np.linalg.norm(m.poses[:, :2] - m.gt_poses[:, :2], axis=1)
    assert err[-1] > err[1]


def test_stfs_roundtrip(tmp_path, small_map):
    m = small_map
    path = str(tmp_path / "map.stfs.covars")
    stfs.save_stfs_covars(
        path, "TestMap", 123.5, m.poses, m.covariances,
        m.point_clouds, m.normal_clouds,
    )
    data = stfs.load_stfs_covars(path)
    assert data.map_name == "TestMap"
    assert data.timestamp == 123.5
    assert data.poses.shape == m.poses.shape
    np.testing.assert_allclose(data.poses, m.poses, atol=1e-3)
    np.testing.assert_allclose(data.covariances, m.covariances, atol=1e-5)
    for a, b in zip(data.point_clouds, m.point_clouds):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_log_roundtrip(tmp_path):
    entries = [
        SingleInput(CorrectionType.COLINEAR, 0,
                    np.array([[0, 0], [1, 0], [5, 5], [6, 5]], np.float32)),
        SingleInput(CorrectionType.PARALLEL, 1,
                    np.array([[0, 1], [1, 1], [5, 6], [6, 6]], np.float32)),
    ]
    path = str(tmp_path / "session.log")
    logs.save_log(path, entries)
    loaded = logs.load_log(path)
    assert len(loaded) == 2
    assert loaded[0].correction_type == CorrectionType.COLINEAR
    assert loaded[1].correction_type == CorrectionType.PARALLEL
    assert loaded[1].undone == 1
    np.testing.assert_allclose(loaded[0].points, entries[0].points, atol=1e-4)


def test_make_map_state_padding(small_map):
    m = small_map
    st = make_map_state(m.poses, m.covariances, m.point_clouds, m.normal_clouds)
    assert st.points.shape[1] % 128 == 0
    counts = np.asarray(st.point_mask.sum(axis=1))
    expected = np.array([len(pc) for pc in m.point_clouds])
    np.testing.assert_array_equal(counts, np.minimum(expected, st.points.shape[1]))
    # world points of pose i, point j match manual transform
    wp = np.asarray(st.world_points())
    i = 10
    c, s = np.cos(m.poses[i, 2]), np.sin(m.poses[i, 2])
    R = np.array([[c, -s], [s, c]])
    manual = m.point_clouds[i] @ R.T + m.poses[i, :2]
    np.testing.assert_allclose(wp[i, : len(manual)], manual, atol=1e-4)


def test_native_parser_matches_numpy(tmp_path, small_map):
    from hitl_slam_tpu import native

    m = small_map
    path = str(tmp_path / "native.stfs.covars")
    stfs.save_stfs_covars(path, "NativeTest", 7.25, m.poses, m.covariances,
                          m.point_clouds, m.normal_clouds)
    assert native.available(), "native parser failed to build"
    fast = stfs.load_stfs_covars(path, use_native=True)
    slow = stfs.load_stfs_covars(path, use_native=False)
    assert fast.map_name == slow.map_name == "NativeTest"
    assert fast.timestamp == slow.timestamp
    np.testing.assert_allclose(fast.poses, slow.poses, atol=1e-5)
    assert len(fast.point_clouds) == len(slow.point_clouds)
    for a, b in zip(fast.point_clouds, slow.point_clouds):
        np.testing.assert_allclose(a, b, atol=1e-5)
    np.testing.assert_allclose(fast.covariances, slow.covariances, atol=1e-6)
