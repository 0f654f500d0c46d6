"""Test harness: force an 8-device virtual CPU mesh before jax imports.

This is the 'multi-node without a cluster' story (SURVEY §4): every
sharding/collective test runs against 8 fake CPU devices, mirroring how the
driver's dryrun validates the multi-chip path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The dev box's axon TPU plugin overrides the JAX_PLATFORMS env var; only a
# config update reliably pins tests to the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# f32 matmuls in tests must be exact f32 (JAX's default decomposes to bf16
# passes even on CPU) — parity tests compare against numpy.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
