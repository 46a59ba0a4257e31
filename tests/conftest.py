"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/collective logic is
exercised without TPU hardware (SURVEY.md section 4: multi-host tests via
xla_force_host_platform_device_count).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize force-registers the axon TPU plugin and the
# env pins JAX_PLATFORMS=axon; the config update below overrides it so tests
# always run on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
