"""Test configuration: force an 8-device virtual CPU mesh.

The reference's distributed tests required >= 2 real GPUs
(version/transparent/scripts/testcode/distrbuted_dataloader.py); here every
multi-device test runs on a virtual CPU mesh so CI needs no TPU.
Must set flags before jax initializes its backends.
"""

import os

# The image's sitecustomize registers the axon TPU backend whenever
# PALLAS_AXON_POOL_IPS is set and prepends it to jax_platforms — clearing
# the var is the only way to get a true CPU run (JAX_PLATFORMS=cpu alone is
# overridden by the plugin registration).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
