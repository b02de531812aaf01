"""Test configuration: force an 8-device virtual CPU mesh.

All sharding/collective tests run against a virtual CPU mesh (the driver
separately dry-run-compiles the multi-chip path on real shapes). Kernel
numerics are identical between CPU and TPU backends.

Note: the environment pins JAX_PLATFORMS=axon (TPU tunnel) and preloads jax
via sitecustomize, so we must override both the env var and the live config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    """Reset jit caches between modules: a single pytest process running
    the FULL suite (fast + slow) accumulates enough compiled-executable
    state that XLA's CPU compiler segfaults partway through (observed in
    backend_compile_and_load while compiling the mapping stage after ~60
    tests). Per-module clearing keeps the process within the stable
    envelope; fast-only and slow-only runs were unaffected."""
    jax.clear_caches()
    yield
