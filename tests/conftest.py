"""Test configuration: force an 8-device virtual CPU mesh.

The reference's distributed tests required >= 2 real GPUs
(version/transparent/scripts/testcode/distrbuted_dataloader.py); here every
multi-device test runs on a virtual CPU mesh so CI needs no TPU.
Must set flags before jax initializes its backends.
"""

import os

# The image's sitecustomize registers the axon TPU backend whenever
# PALLAS_AXON_POOL_IPS is set, and it imports jax at interpreter startup —
# so by the time conftest runs, jax may already be loaded with
# jax_platforms='axon' baked in from the env. Mutating os.environ here is
# then too late; the reliable override is jax.config.update *before any
# backend initializes* (safe: backends init lazily on first use).
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # for spawned subprocesses
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the integration tests re-jit the same big
# XLA:CPU programs every run; warm-cache reruns are up to ~10x faster
# (cli.py / bench.py / __graft_entry__.py already do this).
from pose_estimation_tpu.utils.cache import enable_cache  # noqa: E402

enable_cache(jax, min_compile_secs=1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
