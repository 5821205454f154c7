"""Poseidon: grain-generated constants vs published iden3 vectors; device
batched permutation vs host oracle; MultiPoseidon chunking."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from davinci_tpu import fields as F
from davinci_tpu.hash import (
    get_device_poseidon,
    multi_poseidon,
    poseidon_hash,
)


def test_iden3_vectors():
    # published go-iden3-crypto test vectors
    assert (
        poseidon_hash([1])
        == 18586133768512220936620570745912940619677854269274689475585506675881198879027
    )
    assert (
        poseidon_hash([1, 2])
        == 7853200120776062878684798364095072458815029376092732009249414926327459813530
    )


@pytest.mark.parametrize("arity", [1, 2, 4, 16])
def test_device_matches_host(arity):
    dp = get_device_poseidon(arity + 1)
    r = random.Random(arity)
    rows = [
        [r.randrange(F.BN254_R) for _ in range(arity)] for _ in range(5)
    ]
    got = dp.hash_ints(rows)
    want = [poseidon_hash(row) for row in rows]
    assert got == want


def test_multi_poseidon_chunking():
    r = random.Random(3)
    xs = [r.randrange(F.BN254_R) for _ in range(40)]
    # 40 inputs -> chunks of 16,16,8 -> 3 hashes -> final hash of 3
    h = multi_poseidon(xs)
    h0 = poseidon_hash(xs[:16])
    h1 = poseidon_hash(xs[16:32])
    h2 = poseidon_hash(xs[32:])
    assert h == poseidon_hash([h0, h1, h2])


def test_multi_poseidon_large():
    xs = list(range(1, 300))
    h = multi_poseidon(xs)
    assert 0 < h < F.BN254_R
