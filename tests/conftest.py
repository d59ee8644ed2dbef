"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (SURVEY.md §4: multi-host tests on CPU meshes via fake devices)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon environment's sitecustomize imports jax at interpreter start and
# force-registers the TPU backend (jax.config.update("jax_platforms",
# "axon,cpu")), which overrides JAX_PLATFORMS.  Undo it here, before any
# computation runs: tests always use the 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
