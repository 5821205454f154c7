"""Device witness reduction (groth16/witness_dev.py) vs the host
numpy-object matvec — same residues, same satisfaction verdict, and a
full prove through the forced device path (SURVEY §2.3 witness solver as
XLA program; VERDICT r4 missing #5)."""

import os
import random

import jax.numpy as jnp
import numpy as np
import pytest

from davinci_tpu import fields as F
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.groth16.witness_dev import (
    DeviceCSR,
    matvec_device,
    satisfied_device,
)
from davinci_tpu.msm.pippenger import pack_scalars, unpack_limbs
from davinci_tpu.ntt import get_device_ntt


def _circuit(seed=7, depth=24):
    r = random.Random(seed)
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(0)
    acc = cs.priv_input(r.randrange(1, F.BN254_R))
    for i in range(depth):
        # mix large and small coefficients and multi-term lincombs
        k = r.randrange(1, F.BN254_R) if i % 3 == 0 else r.randrange(1, 9)
        acc = cs.mul(acc * k + i, acc + (F.BN254_R - 1))
    cs.values[1] = acc.value
    cs.assert_eq(acc, y)
    return cs


def test_matvec_device_matches_host():
    cs = _circuit()
    g16 = Groth16("bn254")
    df = get_device_ntt(g16.fr).df
    n = len(cs.constraints)
    N = 1 << max(1, (n - 1).bit_length())
    z = cs.witness()
    want = cs.matvec_all(z, N)

    dcsr = DeviceCSR(cs._flat_matrices(), g16.r, df.L)
    W = -(-g16.g1.r.bit_length() // 12)
    Z_limbs = unpack_limbs(jnp.asarray(pack_scalars(g16.g1, z)), W)
    got = matvec_device(df, dcsr, Z_limbs, N)
    for g, w in zip(got, want):
        assert df.decode(g) == w
    assert bool(satisfied_device(df, *got, n))

    # a corrupted witness must flip the device satisfaction check
    z_bad = list(z)
    z_bad[2] = (z_bad[2] + 1) % g16.r
    Zb = unpack_limbs(jnp.asarray(pack_scalars(g16.g1, z_bad)), W)
    got_bad = matvec_device(df, dcsr, Zb, N)
    assert not bool(satisfied_device(df, *got_bad, n))


def test_fat_row_needs_int64_accumulator():
    """A single constraint row with tens of thousands of large-coefficient
    terms (the lookup finalize identity shape) — column sums reach ~2^43,
    far past int32; verifies the scoped-x64 accumulation."""
    r = random.Random(3)
    p = F.BN254_R
    cs = ConstraintSystem(p)
    y = cs.pub_input(0)
    terms = []
    tot = 0
    for _ in range(20000):
        v = r.randrange(p)
        k = r.randrange(p)
        terms.append((cs.priv_input(v), k))
        tot = (tot + v * k) % p
    lc = cs.constant(0)
    # build the fat LinComb directly (dict merge, not O(n^2) adds)
    d = {}
    for var, k in terms:
        ((i, _),) = var.terms.items()
        d[i] = k
    from davinci_tpu.groth16.r1cs import LinComb

    lc = LinComb(cs, d)
    cs.values[1] = tot
    cs.assert_eq(lc, y)

    g16 = Groth16("bn254")
    df = get_device_ntt(g16.fr).df
    n = len(cs.constraints)
    N = 1 << max(1, (n - 1).bit_length())
    z = cs.witness()
    want = cs.matvec_all(z, N)
    dcsr = DeviceCSR(cs._flat_matrices(), g16.r, df.L)
    W = -(-g16.g1.r.bit_length() // 12)
    Z_limbs = unpack_limbs(jnp.asarray(pack_scalars(g16.g1, z)), W)
    got = matvec_device(df, dcsr, Z_limbs, N)
    for g, w in zip(got, want):
        assert df.decode(g) == w
    assert bool(satisfied_device(df, *got, n))


def test_prove_through_forced_device_path(monkeypatch):
    monkeypatch.setenv("DAVINCI_DEVICE_WITNESS", "force")
    cs = _circuit(seed=11, depth=12)
    g16 = Groth16("bn254")
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=5, s_rand=9)
    assert g16.verify(vk, proof, cs.public_values())
