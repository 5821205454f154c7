"""Pairing validation: bilinearity + non-degeneracy (structural ground truth)."""

import random

import pytest

from davinci_tpu.pairing import PAIRINGS


@pytest.mark.parametrize("name", ["bn254", "bls12_377", "bls12_381"])
def test_bilinearity(name):
    ctx = PAIRINGS[name]
    r = random.Random(1)
    a = r.randrange(2, 2**60)
    b = r.randrange(2, 2**60)
    P = ctx.g1.gen
    Q = ctx.g2.gen

    e = ctx.pair(P, Q)
    one = ctx.fp12.one_ff()
    assert e != one, "degenerate pairing"
    assert e**ctx.r == one, "pairing not in r-torsion"

    eab = ctx.pair(P.mul(a), Q.mul(b))
    assert eab == e ** (a * b), "bilinearity failed"

    # linearity in each slot
    assert ctx.pair(P.mul(a), Q) == e**a
    assert ctx.pair(P, Q.mul(b)) == e**b


def test_pairing_check_form():
    ctx = PAIRINGS["bn254"]
    P, Q = ctx.g1.gen, ctx.g2.gen
    # e(aP, Q) * e(-P, aQ) == 1
    a = 12345
    assert ctx.pairing_check([(P.mul(a), Q), (P.mul(a).neg(), Q)])
    assert ctx.pairing_check([(P.mul(a), Q), (P.neg(), Q.mul(a))])
    assert not ctx.pairing_check([(P.mul(a), Q), (P.neg(), Q.mul(a + 1))])
