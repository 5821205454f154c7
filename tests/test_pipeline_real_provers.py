"""Pipeline with the REAL ProverSet: circuit-2 proofs are actual Groth16
proofs on BLS12-377 (lite statement for CI speed), the aggregator and
state-transition circuits are built from real pipeline data and checked
satisfiable (the debug-prover tier); the gated TPU tier proves everything
(reference sequencer pipeline with real proofs, replacing DevStubProvers).
"""

import random

import pytest

pytestmark = pytest.mark.heavy

from davinci_tpu import fields as F
from davinci_tpu import spec as protocol
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.toycurve import toy_bls12
from davinci_tpu.circuits.voteverifier import VoteVerifierParams
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer.pipeline import InMemoryChain, ProcessInfo, Sequencer
from davinci_tpu.sequencer.provers import ProtocolProvers, ProverModes
from davinci_tpu.spec import state_root
from davinci_tpu.storage import MemoryKV, Storage


@pytest.fixture(scope="module")
def real_pipeline(tmp_path_factory):
    t = toy_bls12()
    params = VoteVerifierParams(
        inner_ctx=t["ctx"],
        inner_vk=None,
        sig_spec=t["g1"],
        include_inner_proof=False,
        include_signature=False,
        hash_native=True,
    )
    store = ArtifactStore(tmp_path_factory.mktemp("artifacts"))
    provers = ProtocolProvers(
        params,
        store=store,
        modes=ProverModes(vote="prove", aggregate="solve", state_transition="solve"),
        n_votes_agg=2,
    )

    rng = random.Random(0xF10)
    pub, priv = generate_key(rng)
    pid = 777
    info = ProcessInfo(
        process_id=pid,
        census_origin=1,
        ballot_mode=0,
        encryption_key=(pub.x, pub.y),
        state_root=state_root(pid, 1, pub.x, pub.y, 0),
    )
    chain = InMemoryChain()
    chain.create_process(info)
    seq = Sequencer(
        Storage(MemoryKV()),
        chain,
        provers=provers,
        batch_time_window=0.0,
        votes_per_batch=2,
    )
    seq.register_process(info, priv_key=priv)

    for i in range(2):
        choice = [0] * protocol.FIELDS_PER_BALLOT
        choice[i % 2] = 1
        b = Ballot.encrypt(choice, pub, rng.randrange(1, 2**200))
        seq.submit_ballot(
            pid,
            rng.randrange(2**160),
            b,
            protocol.VOTE_ID_MIN + rng.randrange(2**40),
            client={"inputs_hash": hex(rng.randrange(1, t["r"]))},
        )
    return seq, chain, pid


def test_real_vote_proofs_flow(real_pipeline):
    seq, chain, pid = real_pipeline
    seq.tick_ballot(max_items=4)
    items = seq.storage.verified_ballots.next(4)
    assert len(items) == 2
    for s, it in items:
        vp = it["vote_proof"]
        assert vp["proven"] is True
        assert "proof" in vp and "vote_hash" in vp
        seq.storage.verified_ballots.release(s)


def test_real_aggregate_and_transition(real_pipeline):
    seq, chain, pid = real_pipeline
    seq.tick_aggregate()
    got = seq.storage.agg_batches.next(1)
    assert got, "aggregation did not run"
    s, batch = got[0]
    assert batch["proof"]["solved"] is True
    assert batch["proof"]["count"] == 2
    assert "batch_hash" in batch["proof"]
    seq.storage.agg_batches.release(s)

    seq.tick_transition(rng=random.Random(5))
    got = seq.storage.transition_batches.next(1)
    assert got, "transition did not run"
    s, tr = got[0]
    assert tr["proof"]["solved"] is True
    assert len(tr["proof"]["public"]) == 3  # root_before, root_after, hash
    seq.storage.transition_batches.release(s)

    seq.tick_onchain()
    assert len(chain.transitions) == 1
    # the submitted payload carries the real (solved) circuit-4 publics
    assert chain.transitions[0][3]["kind"] == "state_transition"
