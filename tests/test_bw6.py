"""BW6-761: pairing (bilinearity, check form) and Groth16 roundtrip — the
outer curve of the aggregator circuit (reference circuits/aggregator,
gnark-crypto bw6-761 role)."""

import random

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.pairing import bw6_pairing


def test_bw6_pairing_bilinear():
    rng = random.Random(61)
    a = rng.randrange(2, 1 << 64)
    b = rng.randrange(2, 1 << 64)
    P, Q = C.bw6_g1.gen, C.bw6_g2.gen
    e1 = bw6_pairing.pair(P.mul(a), Q.mul(b))
    e2 = bw6_pairing.pair(P, Q) ** (a * b % bw6_pairing.r)
    assert e1 == e2
    assert e1 != bw6_pairing.fp6.one_ff()


def test_bw6_pairing_check_form():
    rng = random.Random(67)
    a = rng.randrange(2, 1 << 64)
    b = rng.randrange(2, 1 << 64)
    P, Q = C.bw6_g1.gen, C.bw6_g2.gen
    ok = bw6_pairing.pairing_check(
        [(P.mul(a), Q.mul(b)), (P.mul(a * b % bw6_pairing.r).neg(), Q)]
    )
    assert ok
    bad = bw6_pairing.pairing_check(
        [(P.mul(a), Q.mul(b)), (P.mul(a * b + 1).neg(), Q)]
    )
    assert not bad


def test_bw6_groth16_roundtrip():
    g16 = Groth16("bw6_761")
    cs = ConstraintSystem(F.BW6_761_R)
    y_v = 3**3 + 3 + 5
    y = cs.pub_input(y_v)
    x = cs.priv_input(3)
    cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=5, s_rand=9)
    assert g16.verify(vk, proof, [y_v])
    assert not g16.verify(vk, proof, [y_v + 1])
