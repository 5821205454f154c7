"""Ballot-proof circuit: satisfiability + rule-violation attacks."""

import os
import random

import pytest

from davinci_tpu.ballotmode import BallotMode
from davinci_tpu.circuits.ballotproof import (
    build_ballot_proof_circuit,
    make_ballot,
)
from davinci_tpu.elgamal import generate_key


BM = BallotMode(
    num_fields=4,
    unique_values=True,
    cost_exponent=1,
    max_value=10,
    min_value=0,
    max_value_sum=20,
    min_value_sum=1,
)


def _witness(r, values, bm=BM):
    pub, _ = generate_key(r)
    return make_ballot(
        process_id=123,
        bm=bm,
        pubkey=(pub.x, pub.y),
        address=r.randrange(2**160),
        k=r.randrange(1, 2**200),
        values=values,
    )


def test_ballot_mode_pack_roundtrip():
    assert BallotMode.unpack(BM.pack()) == BM


def test_valid_ballot_satisfies():
    r = random.Random(81)
    w = _witness(r, [3, 1, 0, 7, 0, 0, 0, 0])
    cs = build_ballot_proof_circuit(w)
    assert cs.check_satisfied()
    assert cs.num_public == 1


@pytest.mark.parametrize(
    "values,reason",
    [
        ([11, 1, 0, 2, 0, 0, 0, 0], "value over max"),
        ([3, 3, 0, 2, 0, 0, 0, 0], "duplicate with uniqueness"),
        ([0, 0, 0, 0, 0, 0, 0, 0], "sum under min"),
        ([9, 8, 2, 3, 0, 0, 0, 0], "sum over max"),
        ([1, 2, 0, 0, 5, 0, 0, 0], "unselected field nonzero"),
    ],
)
def test_rule_violations_unsatisfiable(values, reason):
    r = random.Random(82)
    w = _witness(r, values)
    cs = build_ballot_proof_circuit(w)
    assert not cs.check_satisfied(), reason


def test_tampered_ciphertext_unsatisfiable():
    r = random.Random(83)
    w = _witness(r, [1, 2, 0, 4, 0, 0, 0, 0])
    # corrupt one ciphertext coordinate
    c1, c2 = w.ballot.ciphertexts[0]
    from davinci_tpu.elgamal.bjj import BJJ

    w.ballot.ciphertexts[0] = (BJJ(c1.x, (c1.y + 1)), c2)
    cs = build_ballot_proof_circuit(w)
    assert not cs.check_satisfied()


def test_quadratic_cost():
    r = random.Random(84)
    bm = BallotMode(
        num_fields=3,
        cost_exponent=2,
        max_value=5,
        max_value_sum=30,
        min_value_sum=0,
    )
    w = _witness(r, [3, 2, 1, 0, 0, 0, 0, 0], bm=bm)  # cost 9+4+1=14 <= 30
    cs = build_ballot_proof_circuit(w)
    assert cs.check_satisfied()
    w2 = _witness(r, [5, 2, 1, 0, 0, 0, 0, 0], bm=bm)  # 25+4+1=30 <= 30 ok
    assert build_ballot_proof_circuit(w2).check_satisfied()
    bm3 = BallotMode(
        num_fields=3, cost_exponent=2, max_value=6, max_value_sum=30,
    )
    w3 = _witness(r, [6, 2, 1, 0, 0, 0, 0, 0], bm=bm3)  # 36+4+1=41 > 30
    assert not build_ballot_proof_circuit(w3).check_satisfied()


@pytest.mark.skipif(
    not os.environ.get("RUN_CIRCUIT_TESTS"),
    reason="full Groth16 prove is slow; set RUN_CIRCUIT_TESTS=1",
)
def test_ballot_proof_prove_verify():
    from davinci_tpu.groth16 import Groth16

    r = random.Random(85)
    w = _witness(r, [3, 1, 0, 7, 0, 0, 0, 0])
    cs = build_ballot_proof_circuit(w)
    g16 = Groth16("bn254")
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=5, s_rand=6)
    assert g16.verify(vk, proof, [w.inputs_hash()])
