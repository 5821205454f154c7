"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip).

NOTE: the environment's sitecustomize imports jax and registers the TPU
plugin before any test code runs, so JAX_PLATFORMS in os.environ is too
late — the platform must be pinned through jax.config before first backend
use."""

import os

# must be set before the cpu client initializes (read at backend init).
# --xla_cpu_max_isa=AVX2 keeps CPU AOT cache entries loadable across the
# fleet's machine recycles (feature-pinned entries fail with "machine
# features ... vs host machine features" and force full recompiles).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=AVX2"
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


@pytest.fixture(scope="session", autouse=True)
def _setup_disk_cache():
    """Disk-memoize Groth16.setup across test runs.  Setup is
    deterministic (fixed seed) and keyed by (curve, circuit structure
    hash), so cached PK/VK are bit-identical to a fresh run — the
    repeated trusted setups inside fixtures were the dominant cost of
    the quick tier (XLA:CPU + host bignum, tens of seconds each)."""
    import pathlib

    from davinci_tpu.groth16 import core as g16core
    from davinci_tpu.groth16.serialize import (
        cs_structure_hash,
        pk_from_bytes,
        pk_to_bytes,
        vk_from_bytes,
        vk_to_bytes,
    )

    cache_root = pathlib.Path(
        os.environ.get("DAVINCI_TEST_SETUP_CACHE", "/root/repo/.test_setup_cache")
    )
    cache_root.mkdir(parents=True, exist_ok=True)
    orig = g16core.Groth16.setup

    def cached_setup(self, cs, rng=None):
        if rng is not None:  # explicit randomness: bypass
            return orig(self, cs, rng=rng)
        import hashlib

        # structure hash covers the matrices; the committed-wire set and
        # challenge index also shape the PK basis split, so key on them too
        extra = hashlib.sha256(
            repr((sorted(cs.committed), cs.challenge_idx)).encode()
        ).hexdigest()[:16]
        key = f"{self.curve_name}-{cs_structure_hash(cs)}-{extra}"
        pk_p = cache_root / f"{key}.pk"
        vk_p = cache_root / f"{key}.vk"
        if pk_p.exists() and vk_p.exists():
            try:
                pk = pk_from_bytes(pk_p.read_bytes(), self.g1, self.g2)
                vk = vk_from_bytes(vk_p.read_bytes(), self.g1, self.g2)
                return pk, vk
            except Exception:
                pass  # stale/corrupt cache: fall through to fresh setup
        pk, vk = orig(self, cs)
        try:
            # atomic publish: xdist workers may race on the same key
            pid = os.getpid()
            for p, data in (
                (pk_p, pk_to_bytes(pk, self.g1, self.g2)),
                (vk_p, vk_to_bytes(vk, self.g1, self.g2)),
            ):
                tmp = p.with_suffix(p.suffix + f".tmp{pid}")
                tmp.write_bytes(data)
                tmp.replace(p)
        except Exception:
            pass
        return pk, vk

    g16core.Groth16.setup = cached_setup
    yield
    g16core.Groth16.setup = orig


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xDA71)
