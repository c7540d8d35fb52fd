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
# No persistent compilation cache in tests: (a) cache entries AOT-compiled
# on a different machine can SIGILL on load (observed warning), (b) a
# segfault was traced to a cache write racing leaked background threads.
# CPU compiles are fast; tests don't need the cache.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Free compiled executables at module boundaries.

    A full-suite run accumulates hundreds of live XLA:CPU executables in
    one process and deterministically SEGFAULTs inside
    backend_compile_and_load around the ~117th test (reproduced twice at
    the identical test with unrelated code versions; the same module
    passes in isolation). Dropping the jit caches between modules bounds
    live code memory; cross-module executable reuse is rare (different
    shapes), so the wall-clock cost is small."""
    yield
    jax.clear_caches()


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
