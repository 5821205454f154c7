"""Solved-constraint-system serialization (the CCS compile-once role):
a fresh process loads matrices + witness + refinalize metadata from bytes
and re-proves with ZERO Python circuit construction (gnark
circuits/artifacts.go:74-571 cached-CCS parity; VERDICT r4 task 4)."""

import random

from davinci_tpu import fields as F
from davinci_tpu.circuits.lookup import LookupRangeChecker
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.groth16.serialize import (
    SolvedSystem,
    solved_from_bytes,
    solved_to_bytes,
)


def _build(values, challenge, blind, table_bits=8):
    cs = ConstraintSystem(F.BN254_R)
    marker = cs.pub_input(7)
    rc = LookupRangeChecker(cs, table_bits=table_bits)
    for v in values:
        var = cs.priv_input(v)
        rc.range_check(var, 8)
    rc.finalize(challenge, blind)
    cs._refinalize = rc.refinalize
    cs.assert_eq(marker, cs.constant(7))
    return cs


def test_roundtrip_preserves_structure_and_witness():
    cs = _build([3, 200, 255, 0], challenge=0xABCDEF, blind=11)
    blob = solved_to_bytes(cs)
    lo = solved_from_bytes(blob)
    assert isinstance(lo, SolvedSystem)
    assert lo.p == cs.p
    assert lo.num_public == cs.num_public
    assert lo.values == cs.values
    assert lo.committed == cs.committed
    assert lo.challenge_idx == cs.challenge_idx
    assert len(lo.constraints) == len(cs.constraints)
    assert lo.check_satisfied()
    # matvec parity on the real witness
    n = len(cs.constraints)
    assert lo.matvec_all(cs.witness(), n) == cs.matvec_all(cs.witness(), n)


def test_loaded_system_proves_committed_reuse():
    """The elasticity property: prove from the serialized form alone —
    fresh blinding, fresh challenge, in-place refinalize, verified."""
    g16 = Groth16("bn254")
    vals = [3, 200, 255, 0]

    def build(challenge, blind):
        return _build(vals, challenge, blind)

    cs0 = build(0, 0)
    pk, vk = g16.setup(cs0)
    # a first committed prove on the LIVE system fixes the witness plan
    proof0 = g16.prove_committed(pk, build, rng=random.Random(3),
                                 r_rand=5, s_rand=9)
    assert g16.verify_committed(vk, proof0, cs0.public_values())

    # serialize the solved system, reload, and prove WITHOUT the builder
    blob = solved_to_bytes(build(12345678, 4))
    lo = solved_from_bytes(blob)
    proof1 = g16.prove_committed_reuse(pk, lo, rng=random.Random(7),
                                       r_rand=11, s_rand=13)
    assert g16.verify_committed(vk, proof1, lo.public_values())
    # and again with different randomness (values mutate in place)
    proof2 = g16.prove_committed_reuse(pk, lo, rng=random.Random(9),
                                       r_rand=17, s_rand=19)
    assert g16.verify_committed(vk, proof2, lo.public_values())


def test_roundtrip_plain_system():
    """Non-committed circuits serialize too (plain Groth16.prove)."""
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(0)
    acc = cs.priv_input(3)
    for _ in range(6):
        acc = cs.mul(acc, acc + 1)
    cs.values[1] = acc.value
    cs.assert_eq(acc, y)
    g16 = Groth16("bn254")
    pk, vk = g16.setup(cs)
    lo = solved_from_bytes(solved_to_bytes(cs))
    proof = g16.prove(pk, lo, r_rand=5, s_rand=9)
    assert g16.verify(vk, proof, lo.public_values())
