"""Test harness: force an 8-virtual-device CPU platform.

The build box tunnels a single real TPU through the experimental ``axon``
PJRT plugin (registered by a sitecustomize hook whenever PALLAS_AXON_POOL_IPS
is set, which overrides JAX_PLATFORMS from the environment). Tests must run
on CPU with 8 virtual devices so the sharding suite exercises real
multi-device collectives; ``jax.config.update("jax_platforms", "cpu")`` wins
over the plugin even after registration, and XLA_FLAGS must be set before the
first jax import for the host-device count to take effect.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache for the suite: the box has ONE CPU core
# (pytest-xdist measured useless here) and much of the 20-min wall is XLA
# re-compiling the same parity graphs run after run. A warm cache cuts
# repeat gate runs; a cold run pays a few % to populate it. Opt out with
# EIGEN_LSTM_TEST_NO_CACHE=1.
if not os.environ.get("EIGEN_LSTM_TEST_NO_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache_tests")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    yield


@pytest.fixture()
def x64():
    """Enable float64 for numerics-sensitive tests (gradcheck oracle)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
