"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin the TPU platform
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax
import numpy as np
import pytest

# Persistent compile cache: MSM/Groth16 graphs are compile-heavy; caching
# across test runs turns minutes of XLA time into milliseconds.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xDA71)
