"""Device field arithmetic vs the Python-int spec oracle."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from davinci_tpu import fields as F
from davinci_tpu.ff import get_device_field

SPECS = [
    F.bn254_fr,
    F.bn254_fp,
    F.bls12_377_fp,
    F.bls12_377_fr,
    F.bw6_761_fp,
    F.bls12_381_fp,
    F.bls12_381_fr,
    F.secp256k1_fp,
]


def _rand_elems(spec, n, seed=1):
    r = random.Random(seed + spec.p % 100003)
    xs = [r.randrange(spec.p) for _ in range(n - 3)]
    return xs + [0, 1, spec.p - 1]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_limb_roundtrip(spec):
    xs = _rand_elems(spec, 10)
    limbs = spec.batch_to_limbs(xs)
    assert spec.batch_from_limbs(limbs) == [x % spec.p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul_add_sub(spec):
    df = get_device_field(spec)
    n = 16
    xs = _rand_elems(spec, n, seed=2)
    ys = _rand_elems(spec, n, seed=3)
    a = df.encode(xs)
    b = df.encode(ys)

    got_mul = df.decode(df.mul(a, b))
    got_add = df.decode(df.add(a, b))
    got_sub = df.decode(df.sub(a, b))
    got_neg = df.decode(df.neg(a))
    got_sq = df.decode(df.square(a))

    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got_mul[i] == x * y % spec.p, f"mul {i}"
        assert got_add[i] == (x + y) % spec.p, f"add {i}"
        assert got_sub[i] == (x - y) % spec.p, f"sub {i}"
        assert got_neg[i] == (-x) % spec.p, f"neg {i}"
        assert got_sq[i] == x * x % spec.p, f"sq {i}"


@pytest.mark.parametrize("spec", [F.bn254_fr, F.bw6_761_fp], ids=lambda s: s.name)
def test_pow_inv(spec):
    df = get_device_field(spec)
    xs = _rand_elems(spec, 6, seed=4)
    a = df.encode(xs)
    got_pow = df.decode(df.pow_const(a, 65537))
    for i, x in enumerate(xs):
        assert got_pow[i] == pow(x, 65537, spec.p)

    nonzero = [x for x in xs if x % spec.p != 0]
    a = df.encode(nonzero)
    got_inv = df.decode(df.inv(a))
    for i, x in enumerate(nonzero):
        assert got_inv[i] * x % spec.p == 1


@pytest.mark.parametrize("spec", [F.bn254_fr], ids=lambda s: s.name)
def test_mont_roundtrip_and_raw(spec):
    df = get_device_field(spec)
    xs = _rand_elems(spec, 8, seed=5)
    raw = df.encode_raw(xs)
    mont = df.to_mont(raw)
    assert df.decode(mont) == [x % spec.p for x in xs]
    back = df.from_mont(mont)
    assert spec.batch_from_limbs(np.asarray(back)) == [x % spec.p for x in xs]


def test_carry_variants_agree():
    from davinci_tpu.ff.mod import carry_fix, carry_scan

    rng = np.random.default_rng(7)
    cols = jnp.asarray(rng.integers(0, 2**30, size=(32, 44), dtype=np.int32))
    a = carry_scan(cols, 44)
    b = carry_fix(cols, 44)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adversarial ripple: all limbs at the carry fixpoint boundary
    edge = jnp.full((4, 44), 4095, jnp.int32).at[:, 0].set(4096)
    np.testing.assert_array_equal(
        np.asarray(carry_scan(edge, 44)), np.asarray(carry_fix(edge, 44))
    )


def test_lt():
    spec = F.bn254_fr
    df = get_device_field(spec)
    xs = [0, 1, spec.p - 1, spec.p // 2, 12345]
    ys = [0, 2, spec.p - 1, spec.p // 2 + 1, 12345]
    a = jnp.asarray(spec.batch_to_limbs(xs))
    b = jnp.asarray(spec.batch_to_limbs(ys))
    got = np.asarray(df._lt(a, b))
    want = [x < y for x, y in zip(xs, ys)]
    assert list(got) == want
