"""Results-verifier circuit: witness satisfiability, attack mutations, and a
reduced-size Groth16 prove+verify round trip."""

import os
import random

import pytest

from davinci_tpu import spec
from davinci_tpu.circuits.results import (
    build_results_circuit,
    results_witness_from_state,
)
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.state import State, Vote, ballot_index_key


def _election_state(r):
    pub, priv = generate_key(r)
    st = State(process_id=5)
    st.initialize(1, 0, (pub.x, pub.y))
    msgs = [3, 1, 0, 2, 0, 0, 1, 4]
    b = Ballot.encrypt(msgs, pub, r.randrange(1, 2**200))
    reenc, _ = b.reencrypt(pub, r.randrange(1, 2**200))
    v = Vote(
        address=r.randrange(2**160),
        ballot_index=ballot_index_key(0),
        vote_id=spec.VOTE_ID_MIN + 1,
        ballot=b,
        reencrypted_ballot=reenc,
    )
    st.prepare_votes_batch([v])
    return st, pub, priv, msgs


def test_results_circuit_satisfied():
    r = random.Random(71)
    st, pub, priv, msgs = _election_state(r)
    w = results_witness_from_state(st, priv, max_message=100, rng=r)
    assert w.results == msgs
    cs = build_results_circuit(w)
    assert cs.check_satisfied()
    assert cs.num_public == 1 + spec.FIELDS_PER_BALLOT


def test_results_circuit_attacks():
    r = random.Random(72)
    st, pub, priv, msgs = _election_state(r)
    w = results_witness_from_state(st, priv, max_message=100, rng=r)

    # wrong plaintext result
    w_bad = results_witness_from_state(st, priv, max_message=100, rng=r)
    w_bad.results = list(w_bad.results)
    w_bad.results[0] += 1
    cs = build_results_circuit(w_bad)
    assert not cs.check_satisfied()

    # wrong state root
    w_bad2 = results_witness_from_state(st, priv, max_message=100, rng=r)
    w_bad2.state_root = (w_bad2.state_root + 1) % spec.F.BN254_R if hasattr(spec, "F") else w_bad2.state_root + 1
    cs = build_results_circuit(w_bad2)
    assert not cs.check_satisfied()


@pytest.mark.skipif(
    not os.environ.get("RUN_CIRCUIT_TESTS"),
    reason="full-size Groth16 prove is slow; set RUN_CIRCUIT_TESTS=1",
)
def test_results_circuit_prove_verify_full():
    from davinci_tpu.groth16 import Groth16

    r = random.Random(73)
    st, pub, priv, msgs = _election_state(r)
    w = results_witness_from_state(st, priv, max_message=100, rng=r)
    cs = build_results_circuit(w)
    g16 = Groth16("bn254")
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=3, s_rand=4)
    assert g16.verify(vk, proof, [w.state_root] + w.results)
