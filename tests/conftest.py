"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip).

NOTE: the environment's sitecustomize imports jax and registers the TPU
plugin before any test code runs, so JAX_PLATFORMS in os.environ is too
late — the platform must be pinned through jax.config before first backend
use."""

import os

# must be set before the cpu client initializes (read at backend init)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

if not os.environ.get("RUN_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: MSM/Groth16 graphs are compile-heavy; caching
# across test runs turns minutes of XLA time into milliseconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xDA71)
