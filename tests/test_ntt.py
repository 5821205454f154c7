"""NTT vs naive host DFT; roundtrips; coset consistency."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from davinci_tpu import fields as F
from davinci_tpu.ntt import get_device_ntt

SPECS = [F.bn254_fr, F.bls12_377_fr]


def _naive_dft(spec, coeffs, w):
    n = len(coeffs)
    return [
        sum(c * pow(w, i * k, spec.p) for i, c in enumerate(coeffs)) % spec.p
        for k in range(n)
    ]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_ntt_matches_dft(spec):
    ntt = get_device_ntt(spec)
    n = 16
    r = random.Random(5)
    coeffs = [r.randrange(spec.p) for _ in range(n)]
    w, _, _ = ntt._roots(4)
    assert pow(w, n, spec.p) == 1 and pow(w, n // 2, spec.p) != 1
    want = _naive_dft(spec, coeffs, w)
    got = ntt.df.decode(ntt.ntt(ntt.df.encode(coeffs)))
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_ntt_roundtrip(spec):
    ntt = get_device_ntt(spec)
    n = 256
    r = random.Random(6)
    coeffs = [r.randrange(spec.p) for _ in range(n)]
    x = ntt.df.encode(coeffs)
    back = ntt.df.decode(ntt.intt(ntt.ntt(x)))
    assert back == coeffs


def test_coset_eval():
    spec = F.bn254_fr
    ntt = get_device_ntt(spec)
    n = 16
    r = random.Random(8)
    coeffs = [r.randrange(spec.p) for _ in range(n)]
    g = spec.multiplicative_generator
    w, _, _ = ntt._roots(4)
    # expected: evaluations at g * w^k
    want = [
        sum(c * pow(g * pow(w, k, spec.p) % spec.p, i, spec.p) for i, c in enumerate(coeffs)) % spec.p
        for k in range(n)
    ]
    got = ntt.df.decode(ntt.coset_ntt(ntt.df.encode(coeffs)))
    assert got == want
    back = ntt.df.decode(ntt.coset_intt(ntt.coset_ntt(ntt.df.encode(coeffs))))
    assert back == coeffs


def test_sharded_ntt_matches_single_device():
    """Four-step mesh-sharded NTT (all_to_all + local Stockham +
    psum_scatter) bit-matches the single-device transform on the 8-device
    virtual mesh, forward and inverse."""
    import jax

    spec = F.bn254_fr
    ntt = get_device_ntt(spec)
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("shard",))
    rng = random.Random(3)
    n = 512
    vals = [rng.randrange(spec.p) for _ in range(n)]
    x = ntt.df.encode(vals)
    want = np.asarray(ntt.ntt(x))
    got = np.asarray(ntt.sharded_ntt(x, mesh))
    assert np.array_equal(want, got)
    wanti = np.asarray(ntt.intt(x))
    goti = np.asarray(ntt.sharded_intt(x, mesh))
    assert np.array_equal(wanti, goti)
    # roundtrip through the sharded pair
    back = np.asarray(ntt.sharded_intt(jnp.asarray(got), mesh))
    assert np.array_equal(back, np.asarray(x))


def test_batched_ntt():
    spec = F.bn254_fr
    ntt = get_device_ntt(spec)
    n = 32
    r = random.Random(9)
    polys = [[r.randrange(spec.p) for _ in range(n)] for _ in range(3)]
    x = jnp.stack([ntt.df.encode(p) for p in polys])  # (3, n, L)
    out = ntt.ntt(x)
    w, _, _ = ntt._roots(5)
    for b in range(3):
        assert ntt.df.decode(out[b]) == _naive_dft(spec, polys[b], w)
