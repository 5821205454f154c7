"""Multi-chip Groth16 proving on the virtual device mesh: with a mesh
set, proving-key MSMs run as sharded_msm (all_gather bucket merge) and
the quotient NTTs as the four-step collective transform — proofs must be
BIT-IDENTICAL to single-device (same witness, same randomness)."""

import random

import numpy as np
import pytest

from davinci_tpu import fields as F
from davinci_tpu.groth16 import ConstraintSystem, Groth16


def _circuit(rng):
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(0)
    acc = cs.priv_input(rng.randrange(1, 1 << 60))
    for _ in range(40):
        acc = cs.mul(acc, acc + 1)
    cs.values[1] = acc.value  # patch the public to the computed value
    cs.assert_eq(acc, y)
    return cs


def test_sharded_prove_bit_identical():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("shard",))

    rng = random.Random(0xD1)
    cs = _circuit(rng)
    g16 = Groth16("bn254")
    pk, vk = g16.setup(cs)

    base = g16.prove(pk, cs, r_rand=5, s_rand=9)
    g16.set_mesh(mesh)
    try:
        sharded = g16.prove(pk, cs, r_rand=5, s_rand=9)
    finally:
        g16.set_mesh(None)

    assert sharded.a == base.a
    assert sharded.b == base.b
    assert sharded.c == base.c
    assert g16.verify(vk, sharded, cs.public_values())
