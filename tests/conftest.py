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

# Persistent compilation cache: the suite re-jits many near-identical tiny
# programs; identical HLO is reloaded from disk across test modules and
# across runs (the single-CPU box spends most of the 50-min wall on XLA
# compiles — VERDICT r1 weak #7).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full 293-test suite deterministically segfaulted inside XLA:CPU's
    `backend_compile_and_load` on the ~240th test's (largest) compile —
    while the same test passes in any fresh process — i.e. cumulative
    in-process compiler/JIT state, not a test bug. Dropping executable
    caches between modules keeps the process young; the persistent disk
    cache (above) makes any recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
