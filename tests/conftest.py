"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may pin the TPU platform
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xDA71)
