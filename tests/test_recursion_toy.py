"""End-to-end EMULATED recursion at CI scale: a real Groth16 proof on the
toy BLS12 curve (circuits/toycurve.py) verified IN-CIRCUIT over BLS12-377
through EmulatedOps — the exact code path the full-size vote verifier
(circuit 2) uses with BN254 inner proofs (reference
circuits/voteverifier/vote_verifier.go:71-87).

This is the heavyweight CI test (~2 min: ~3.5M-constraint build +
vectorized satisfiability); full-size BN254-in-BLS377 is gated."""

import pytest

pytestmark = pytest.mark.heavy

from davinci_tpu import fields as F
from davinci_tpu.circuits.pairing_gadget import Groth16VerifierGadget
from davinci_tpu.circuits.toycurve import toy_bls12, toy_groth16
from davinci_tpu.groth16 import ConstraintSystem


@pytest.fixture(scope="module")
def toy_inner():
    t = toy_bls12()
    g16 = toy_groth16()
    cs = ConstraintSystem(t["r"])
    y_v = (3**3 + 3 + 5) % t["r"]
    y = cs.pub_input(y_v)
    x = cs.priv_input(3)
    cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=7, s_rand=11)
    assert g16.verify(vk, proof, [y_v])
    return t, vk, proof, y_v


def test_emulated_groth16_verify_in_circuit(toy_inner):
    t, vk, proof, y_v = toy_inner
    cs = ConstraintSystem(F.BLS12_377_R)
    gadget = Groth16VerifierGadget(cs, t["ctx"], vk)  # emulated base ops
    yb = gadget.scalar_bits_from_native(cs.priv_input(y_v))
    pv = gadget.alloc_proof(proof)
    gadget.assert_valid(pv, [yb])
    assert cs.check_satisfied()


def test_emulated_groth16_verify_rejects_bad_public(toy_inner):
    t, vk, proof, y_v = toy_inner
    cs = ConstraintSystem(F.BLS12_377_R)
    gadget = Groth16VerifierGadget(cs, t["ctx"], vk)
    yb = gadget.scalar_bits_from_native(cs.priv_input(y_v + 1))
    pv = gadget.alloc_proof(proof)
    with pytest.raises(AssertionError):
        gadget.assert_valid(pv, [yb])


def test_emulated_verify_with_lookup_range_checks(toy_inner):
    """The same in-circuit verification with the log-derivative lookup
    range-check tier (Groth16 commitment extension): the constraint count
    collapses vs the bit-decomposition tier — the path to gnark-parity
    emulated circuits (BENCH_NOTES.md)."""
    from davinci_tpu.circuits.emulated import EmulatedOps
    from davinci_tpu.circuits.lookup import LookupRangeChecker

    t, vk, proof, y_v = toy_inner
    cs = ConstraintSystem(F.BLS12_377_R)
    rc = LookupRangeChecker(cs, table_bits=12)
    base = EmulatedOps(cs, t["ctx"].p, range_checker=rc)
    gadget = Groth16VerifierGadget(cs, t["ctx"], vk, base_ops=base)
    yb = gadget.scalar_bits_from_native(cs.priv_input(y_v))
    pv = gadget.alloc_proof(proof)
    gadget.assert_valid(pv, [yb])
    rc.finalize(0x1CEB00DA12345, 7)
    n = len(cs.constraints)
    assert cs.check_satisfied(), cs.first_unsatisfied()
    # bit tier measures ~3.5M for this statement; lookup tier must be
    # at least 4x smaller
    assert n < 900_000, n


@pytest.fixture(scope="module")
def toy_inner_committed():
    """A committed toy proof (cs.commit -> Pedersen D + PoK + Fiat-Shamir
    challenge wire), host-verified — the inner object the aggregator must
    recursively verify once circuit 2 proves through the lookup tier."""
    t = toy_bls12()
    g16 = toy_groth16()
    y_v = (3**3 + 3 + 5) % t["r"]

    def build(challenge, blind):
        cs = ConstraintSystem(t["r"])
        y = cs.pub_input(y_v)
        x = cs.priv_input(3)
        cs.assert_eq(cs.mul(cs.mul(x, x), x) + x + 5, y)
        ch = cs.commit([x], challenge, blind)
        # make the challenge load-bearing: a wire depending on H(D)
        w = cs.priv_input((3 + ch.value) % t["r"])
        cs.assert_eq(x + ch, w)
        return cs

    cs0 = build(0, 1)
    pk, vk = g16.setup(cs0)
    proof = g16.prove_committed(pk, build, r_rand=5, s_rand=9)
    assert g16.verify_committed(vk, proof, [y_v])
    return t, vk, proof, y_v


def test_native_committed_verify_in_circuit(toy_inner_committed):
    """assert_valid_committed over NATIVE base ops (the 2-chain aggregator
    shape): PoK pairing check + in-circuit Poseidon challenge + D folded
    into the public-input accumulation."""
    t, vk, proof, y_v = toy_inner_committed
    cs = ConstraintSystem(t["p"])  # outer field == inner base field
    gadget = Groth16VerifierGadget(cs, t["ctx"], vk)
    yb = gadget.scalar_bits_from_native(cs.priv_input(y_v))
    pv = gadget.alloc_committed_proof(proof)
    gadget.assert_valid_committed(pv, [yb])
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_native_committed_verify_rejects_tampered_commitment(
    toy_inner_committed,
):
    """Scaling (D, pok) by 2 keeps the PoK check valid but changes H(D) —
    the challenge binding must make the main equation unsatisfiable."""
    from davinci_tpu.groth16.core import CommittedProof

    t, vk, proof, y_v = toy_inner_committed
    bad = CommittedProof(
        a=proof.a, b=proof.b, c=proof.c,
        d=proof.d.mul(2), pok=proof.pok.mul(2),
    )
    cs = ConstraintSystem(t["p"])
    gadget = Groth16VerifierGadget(cs, t["ctx"], vk)
    yb = gadget.scalar_bits_from_native(cs.priv_input(y_v))
    pv = gadget.alloc_committed_proof(bad)
    try:
        gadget.assert_valid_committed(pv, [yb])
        ok = cs.check_satisfied()
    except AssertionError:
        ok = False
    assert not ok
