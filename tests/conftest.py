"""Test configuration: force the JAX CPU backend with 8 virtual devices.

All unit tests run on a virtual 8-device CPU mesh so multi-chip sharding
(`shard_map` / pjit over a Mesh) is exercised without TPU hardware, per the
framework's test strategy (SURVEY.md §4). The environment pins
JAX_PLATFORMS=axon via sitecustomize, so we override in-process before any
device is touched.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite is XLA-CPU-compile-bound (the heavy jit programs cost 20-150s
# each to build); a persistent compilation cache makes repeat runs disk
# hits.  Keyed by program + jax version, machine-local.  Disable with
# MAR_TEST_COMPILE_CACHE=0 to force cold compiles.
from multimodalaggressionrecognition_tpu.utils.compile_cache import (
    enable_test_cache)

enable_test_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
