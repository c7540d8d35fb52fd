"""Differential test: device ordering == host reference ordering."""

import jax.numpy as jnp
import numpy as np

from hitl_slam_tpu.models.hitl import em_input
from hitl_slam_tpu.models.hitl.ordering import order_on_device


def _random_counts(rng, P, kind):
    c1 = np.zeros(P, np.int64)
    c2 = np.zeros(P, np.int64)
    if kind == "good":       # first later than second
        c1[rng.integers(P // 2, P, 5)] = 10
        c2[rng.integers(0, P // 4, 5)] = 10
    elif kind == "swapped":  # user drew anchor pair first
        c1[rng.integers(0, P // 4, 5)] = 10
        c2[rng.integers(P // 2, P, 5)] = 10
    elif kind == "overlap_partial":
        a = rng.integers(P // 2, P, 6)
        c1[a] = 10
        c2[a[:2]] = 10
        c2[rng.integers(0, P // 4, 4)] = 10
    elif kind == "overlap_complete":
        a = rng.integers(0, P, 6)
        c1[a] = 10
        c2[a] = 10
    elif kind == "interleaved":
        c1[rng.integers(0, P, 8)] = 10
        c2[rng.integers(0, P, 8)] = 10
    elif kind == "empty":
        pass
    return c1, c2


def test_device_ordering_matches_host(rng):
    P = 128
    sel = np.array([[0, 0], [1, 0], [5, 5], [6, 5]], np.float32)
    kinds = ["good", "swapped", "overlap_partial", "overlap_complete",
             "interleaved", "empty"]
    for kind in kinds:
        for trial in range(6):
            c1, c2 = _random_counts(rng, P, kind)
            host = em_input.order_and_filter(c1, c2, sel)
            dev = order_on_device(
                jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(sel)
            )
            assert bool(dev.valid) == host.valid, (kind, trial)
            if not host.valid:
                continue
            np.testing.assert_array_equal(
                np.asarray(dev.sel), host.selected_points, err_msg=kind
            )
            got_c = np.asarray(dev.corrected_idx)
            got_c = got_c[got_c >= 0]
            np.testing.assert_array_equal(got_c, host.corrected_poses,
                                          err_msg=kind)
            got_a = np.asarray(dev.anchor_idx)
            got_a = got_a[got_a >= 0]
            np.testing.assert_array_equal(got_a, host.anchor_poses,
                                          err_msg=kind)
            assert int(dev.bp_min) == host.backprop_start, kind
            assert int(dev.bp_max) == host.backprop_end, kind
            # group mask = first contiguous run of corrected poses
            breaks = np.nonzero(np.diff(host.corrected_poses) > 1)[0]
            end = breaks[0] if len(breaks) else len(host.corrected_poses) - 1
            expect_group = host.corrected_poses[: end + 1]
            got_group = np.nonzero(np.asarray(dev.group_mask))[0]
            np.testing.assert_array_equal(got_group, expect_group, err_msg=kind)
            assert int(dev.last_pose) == expect_group[-1], kind
