"""Toy 2-chain (inner BLS12 family + Cocks-Pinch k=6 outer, the CI-scale
mirror of BLS12-377/BW6-761) and the full-loop in-circuit BW6 Groth16
verification it enables — circuit 4's aggregator-verification core
(reference circuits/statetransition/statetransition.go:240
VerifyAggregatorProof).  The production BW6-761 instantiation runs the
IDENTICAL gadget code with a different ctx (gated: scripts/fullsize_c4.py)."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.lookup import LookupRangeChecker
from davinci_tpu.circuits.pairing_gadget6 import (
    Groth16VerifierGadgetBW6,
    PairingGadget6,
)
from davinci_tpu.circuits.toycurve import toy_2chain, toy_2chain_groth16
from davinci_tpu.groth16 import ConstraintSystem


def test_toy2chain_construction():
    t = toy_2chain()
    inner, ctx6 = t["inner"], t["ctx6"]
    # chain link: the outer curve's scalar field IS the inner base field
    assert ctx6.r == inner["p"]
    # bilinearity on the outer pairing
    e1 = ctx6.pair(ctx6.g1.gen.mul(11), ctx6.g2.gen.mul(13))
    e2 = ctx6.pair(ctx6.g1.gen, ctx6.g2.gen) ** 143
    assert e1 == e2 and e1 != ctx6.fp6.one_ff()
    # NTT-friendliness on BOTH layers (Groth16 domains must exist)
    assert (inner["r"] - 1) % (1 << 13) == 0
    assert (inner["p"] - 1) % (1 << 13) == 0


def test_outer_groth16_proves():
    """Host Groth16 over the toy outer curve (the aggregator's role)."""
    t = toy_2chain()
    _, outer = toy_2chain_groth16()
    r = t["ctx6"].r
    cs = ConstraintSystem(r)
    y_v = (3**3 + 3 + 5) % r
    y = cs.pub_input(y_v)
    x = cs.priv_input(3)
    cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
    pk, vk = outer.setup(cs)
    proof = outer.prove(pk, cs, r_rand=7, s_rand=11)
    assert outer.verify(vk, proof, [y_v])
    assert not outer.verify(vk, proof, [(y_v + 1) % r])


def test_gadget_ctor_production_signature():
    """The production call-site signature (statetransition.py:501): ctx +
    range_checker kwargs, truncated loop for cost — ctor, proof alloc,
    public-input MSM all build and the truncated Miller is satisfiable."""
    t = toy_2chain()
    _, outer = toy_2chain_groth16()
    ctx6 = t["ctx6"]
    r = ctx6.r
    cs0 = ConstraintSystem(r)
    y = cs0.pub_input(5)
    x = cs0.priv_input(2)
    cs0.assert_eq(cs0.mul(x, x) + 1, y)
    pk, vk = outer.setup(cs0)
    proof = outer.prove(pk, cs0, r_rand=3, s_rand=4)

    cs = ConstraintSystem(F.BN254_R)
    rc = LookupRangeChecker(cs, table_bits=12)
    g = Groth16VerifierGadgetBW6(
        cs, vk, ctx=ctx6, loop_bits=8, range_checker=rc
    )
    pv = g.alloc_proof(proof)
    yb = [cs.to_bits(cs.priv_input(5), r.bit_length())]
    g.public_input_msm(yb)
    g.pg.miller_pairs([(pv["A"], ("var", pv["B"]))])
    rc.finalize(0xABCDEF, 3)
    assert cs.check_satisfied(), cs.first_unsatisfied()


@pytest.mark.heavy
def test_full_loop_bw6_verify_gadget():
    """FULL-Miller-loop, full-final-exp in-circuit Groth16 verification
    over the toy outer curve with lookup range checks — the complete
    aggregator-verification code path at CI scale (~4.4M constraints)."""
    t = toy_2chain()
    _, outer = toy_2chain_groth16()
    ctx6 = t["ctx6"]
    r = ctx6.r
    cs0 = ConstraintSystem(r)
    y_v = (3**3 + 3 + 5) % r
    y = cs0.pub_input(y_v)
    x = cs0.priv_input(3)
    cs0.assert_eq(cs0.mul(cs0.mul(x, x), x) + x + 5, y)
    pk, vk = outer.setup(cs0)
    proof = outer.prove(pk, cs0, r_rand=7, s_rand=11)
    assert outer.verify(vk, proof, [y_v])

    cs = ConstraintSystem(F.BN254_R)
    rc = LookupRangeChecker(cs, table_bits=12)
    gadget = Groth16VerifierGadgetBW6(cs, vk, ctx=ctx6, range_checker=rc)
    pv = gadget.alloc_proof(proof)
    yb = [cs.to_bits(cs.priv_input(y_v), r.bit_length())]
    gadget.assert_valid(pv, yb)
    rc.finalize(0x1CEB00DA12345, 7)
    assert cs.check_satisfied(), cs.first_unsatisfied()
