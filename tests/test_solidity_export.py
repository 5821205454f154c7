"""Solidity verifier export: generated source replayed against real proofs.

No EVM is available in this image, so the counterpart of the reference's
simulated-geth verifier deployment test (circuits/test/statetransition/
statetransition_test.go:20-36) is `replay_verifier_source`: it parses the
constants back OUT of the emitted .sol source and re-executes the exact
verification protocol the contract encodes (precompile semantics) via the
host pairing.  A constant mix-up (word order, negation, challenge DST)
makes the replay reject a valid proof.
"""

import random

from davinci_tpu import fields as F
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.web3.encoding import (
    groth16_commitment_proof_tuple,
    groth16_proof_tuple,
)
from davinci_tpu.web3.solidity_export import (
    export_solidity_verifier,
    replay_verifier_source,
)


def _cubic(x_val, y_pub):
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(y_pub)
    x = cs.priv_input(x_val)
    x3 = cs.mul(cs.mul(x, x), x)
    cs.assert_eq(x3 + x + 5, y)
    return cs


def test_plain_verifier_export_and_replay():
    g16 = Groth16("bn254")
    x, y = 3, 3**3 + 3 + 5
    cs = _cubic(x, y)
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=7, s_rand=11)
    assert g16.verify(vk, proof, [y])

    src = export_solidity_verifier(vk, name="results-verifier")
    assert "contract VerifierResultsVerifier" in src
    assert "verifyProof" in src
    assert "pragma solidity" in src

    words = groth16_proof_tuple(proof)
    assert replay_verifier_source(src, words, [y])
    assert not replay_verifier_source(src, words, [y + 1])
    # malformed public (>= r) rejected before any curve work
    assert not replay_verifier_source(src, words, [F.BN254_R])
    # tampered proof word
    bad = list(words)
    bad[0] = (bad[0] + 1) % (2**256)
    assert not replay_verifier_source(src, bad, [y])


def test_committed_verifier_export_and_replay():
    from davinci_tpu.circuits.lookup import LookupRangeChecker

    g16 = Groth16("bn254")

    def build(challenge, blind):
        cs = ConstraintSystem(F.BN254_R)
        pub = cs.pub_input(7)
        rc = LookupRangeChecker(cs, table_bits=8)
        for v in (3, 200, 255):
            rc.range_check(cs.priv_input(v), 8)
        cs.assert_eq(pub, cs.constant(7))
        rc.finalize(challenge, blind)
        return cs

    pk, vk = g16.setup(build(0, 0))
    proof = g16.prove_committed(
        pk, build, rng=random.Random(11), r_rand=5, s_rand=9
    )
    assert g16.verify_committed(vk, proof, [7])

    src = export_solidity_verifier(vk, name="state_transition")
    assert "verifyCommittedProof" in src
    assert "davinci-commit-v1" in src

    words = groth16_commitment_proof_tuple(proof)
    assert len(words) == 12
    assert replay_verifier_source(src, words, [7])
    assert not replay_verifier_source(src, words, [8])
    # tamper D: FS challenge shifts -> reject
    bad = list(words)
    bad[8] = (bad[8] + 1) % (2**256)
    assert not replay_verifier_source(src, bad, [7])
