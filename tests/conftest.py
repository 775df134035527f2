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
