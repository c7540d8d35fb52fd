"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Do NOT claim the axon TPU tunnel for CPU-only tests: the sitecustomize
# registration round-trips a remote grant per process and can stall for
# minutes when the chip is busy.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

# sitecustomize may have imported jax before this file runs, in which case
# the env vars above are too late; jax.config still works pre-backend-init.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_map():
    """A small synthetic figure-8 map shared across tests."""
    from hitl_slam_tpu.io.figure8 import generate_figure8

    return generate_figure8(num_poses=96, num_rays=90, seed=3)


@pytest.fixture(scope="session")
def small_state(small_map):
    from hitl_slam_tpu.core.state import make_map_state

    m = small_map
    return make_map_state(
        m.poses, m.covariances, m.point_clouds, m.normal_clouds,
        odometry=m.odometry, constraint_capacity=512,
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
