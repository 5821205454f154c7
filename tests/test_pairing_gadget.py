"""In-circuit pairing / Groth16-verify gadget tests.

The native instantiation is the heart of the recursion chain: BLS12-377
arithmetic inside a BW6-761 circuit (the 2-chain), verifying real Groth16
proofs in-circuit — the reference aggregator's core operation
(circuits/aggregator/aggregator.go:18-56).  Satisfiability is the test
vehicle (proving these circuits is the Groth16 backend's job, tested
elsewhere)."""

import random

import pytest

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.circuits.pairing_gadget import (
    Groth16VerifierGadget,
    PairingGadget12,
)
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.pairing import bls377_pairing, bn254_pairing


def _rand_g1(spec, rng):
    return spec.gen.mul(rng.randrange(2, spec.r))


def _rand_g2(spec, rng):
    return spec.gen.mul(rng.randrange(2, spec.r))


def test_miller_var_matches_host_oracle():
    cs = ConstraintSystem(F.BW6_761_R)
    pg = PairingGadget12(cs, bls377_pairing)
    rng = random.Random(31)
    P = _rand_g1(C.bls377_g1, rng)
    Q = _rand_g2(C.bls377_g2, rng)
    Pg = pg.g1.alloc_point(P)
    Qg = (pg.fp2.alloc(Q.x.v), pg.fp2.alloc(Q.y.v))
    f = pg.miller_pairs([(Pg, ("var", Qg))])
    assert pg.fp12_value(f) == bls377_pairing.miller(P, Q)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_miller_const_matches_host_oracle():
    cs = ConstraintSystem(F.BW6_761_R)
    pg = PairingGadget12(cs, bls377_pairing)
    rng = random.Random(37)
    P = _rand_g1(C.bls377_g1, rng)
    Q = _rand_g2(C.bls377_g2, rng)
    Pg = pg.g1.alloc_point(P)
    f = pg.miller_pairs([(Pg, ("const", Q))])
    assert pg.fp12_value(f) == bls377_pairing.miller(P, Q)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_miller_multi_product_and_final_exp():
    """Product over pairs with a known-good pairing relation:
    e(-aP, Q) * e(P, aQ) == 1 — the full in-circuit pairing check."""
    cs = ConstraintSystem(F.BW6_761_R)
    pg = PairingGadget12(cs, bls377_pairing)
    rng = random.Random(41)
    a = rng.randrange(2, 1 << 64)
    P = _rand_g1(C.bls377_g1, rng)
    Q = _rand_g2(C.bls377_g2, rng)
    nPa = P.mul(a).neg()
    Qa = Q.mul(a)
    p1 = pg.g1.alloc_point(nPa)
    p2 = pg.g1.alloc_point(P)
    f = pg.miller_pairs([(p1, ("const", Q)), (p2, ("const", Qa))])
    pg.assert_final_exp_is_one(f)
    assert cs.check_satisfied(), cs.first_unsatisfied()
    n = len(cs.constraints)
    assert n < 120_000, f"pairing check too expensive: {n}"


def test_final_exp_rejects_non_unit():
    cs = ConstraintSystem(F.BW6_761_R)
    pg = PairingGadget12(cs, bls377_pairing)
    rng = random.Random(43)
    P = _rand_g1(C.bls377_g1, rng)
    Q = _rand_g2(C.bls377_g2, rng)
    Pg = pg.g1.alloc_point(P)
    f = pg.miller_pairs([(Pg, ("const", Q))])  # FE(f) = e(P,Q) != 1
    with pytest.raises(AssertionError):
        pg.assert_final_exp_is_one(f)


def _inner_cubic_proof():
    """A real BLS12-377 Groth16 proof of the toy cubic circuit."""
    g16 = Groth16("bls12_377")
    cs = ConstraintSystem(F.BLS12_377_R)
    y_v = 3**3 + 3 + 5
    y = cs.pub_input(y_v)
    x = cs.priv_input(3)
    cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=7, s_rand=11)
    assert g16.verify(vk, proof, [y_v])
    return vk, proof, y_v


@pytest.fixture(scope="module")
def inner():
    return _inner_cubic_proof()


def test_groth16_verify_in_circuit_native(inner):
    """The 2-chain milestone: a BW6-761 circuit verifying a real BLS12-377
    Groth16 proof with native field arithmetic."""
    vk, proof, y_v = inner
    cs = ConstraintSystem(F.BW6_761_R)
    gadget = Groth16VerifierGadget(cs, bls377_pairing, vk)
    y_outer = cs.priv_input(y_v)  # upper-circuit value binding the public
    bits = gadget.scalar_bits_from_native(y_outer)
    pv = gadget.alloc_proof(proof)
    gadget.assert_valid(pv, [bits])
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_groth16_verify_in_circuit_rejects_bad(inner):
    vk, proof, y_v = inner
    cs = ConstraintSystem(F.BW6_761_R)
    gadget = Groth16VerifierGadget(cs, bls377_pairing, vk)
    y_outer = cs.priv_input(y_v + 1)  # wrong public input
    bits = gadget.scalar_bits_from_native(y_outer)
    pv = gadget.alloc_proof(proof)
    with pytest.raises(AssertionError):
        gadget.assert_valid(pv, [bits])


def test_groth16_verify_in_circuit_rejects_tampered_proof(inner):
    vk, proof, y_v = inner
    from davinci_tpu.groth16.core import Proof

    bad = Proof(a=proof.a.mul(2), b=proof.b, c=proof.c)
    cs = ConstraintSystem(F.BW6_761_R)
    gadget = Groth16VerifierGadget(cs, bls377_pairing, vk)
    bits = gadget.scalar_bits_from_native(cs.priv_input(y_v))
    pv = gadget.alloc_proof(bad)
    with pytest.raises(AssertionError):
        gadget.assert_valid(pv, [bits])


def test_bn254_miller_gadget_matches_host():
    """BN254 gadget (the emulated target) first checked in its native field
    (cheap) — the BN-specific frobenius tail is curve logic, not ops logic."""
    cs = ConstraintSystem(F.BN254_P)  # base field as native: pure oracle test
    from davinci_tpu.circuits.algebra import NativeOps

    pg = PairingGadget12(cs, bn254_pairing, NativeOps(cs))
    rng = random.Random(47)
    P = _rand_g1(C.bn254_g1, rng)
    Q = _rand_g2(C.bn254_g2, rng)
    Pg = pg.g1.alloc_point(P)
    Qg = (pg.fp2.alloc(Q.x.v), pg.fp2.alloc(Q.y.v))
    f = pg.miller_pairs([(Pg, ("var", Qg))])
    assert pg.fp12_value(f) == bn254_pairing.miller(P, Q)
    assert cs.check_satisfied(), cs.first_unsatisfied()
