"""Test harness: run all tests on a virtual 8-device CPU mesh.

Must set env before jax is imported anywhere, hence top of conftest.
Multi-device sharding tests use the virtual devices; parity tests compare
against torch (CPU) where available.
"""

import os

# The container's sitecustomize imports jax (registering the TPU backend)
# before any test code runs, so JAX_PLATFORMS in os.environ is already
# baked in; jax.config.update is the reliable override.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache (durable repo-local dir, shared with bench /
# the dryrun / the quality tools): repeat suite runs skip the slow CPU
# compiles of the train-step and sharding tests
from cmgan_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(jax.config)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
