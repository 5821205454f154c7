"""Sequencer pipeline with EVERY circuit at the "prove" tier: real Groth16
proofs for circuit 2 (toy-2chain inner), circuit 3 (toy-2chain outer — the
aggregator's BW6 role, natively verifying the real inner proofs), and
circuit 4 (BN254), flowing through the artifact store to the chain fake.

This exercises the path the production TPU tier runs
(ProverModes(vote/aggregate/state_transition="prove"), reference
sequencer/statetransition.go:222 + aggregate.go:446) at CI scale: the
toy 2-chain (circuits/toycurve.py) keeps the native-recursion algebra
identical to BLS12-377/BW6-761 while the fields stay ~90-290 bits.
"""

import os
import random

import pytest

# the aggregator setup/prove on the toy OUTER curve (216k constraints,
# 30-limb coords) exceeds 85 min on XLA:CPU (measured,
# scripts/prove_tier_probe.py) — this tier needs the real chip, where the
# same phases are minutes.  The CPU-tier pipeline coverage (vote=prove,
# aggregate/state_transition=solve) lives in test_pipeline_real_provers.
pytestmark = [
    pytest.mark.heavy,
    pytest.mark.skipif(
        not os.environ.get("RUN_TPU_TESTS"),
        reason="all-prove pipeline tier needs the real TPU "
        "(RUN_TPU_TESTS=1); CPU-tier prove coverage: "
        "test_pipeline_real_provers + scripts/prove_tier_probe.py",
    ),
]

from davinci_tpu import spec as protocol
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.toycurve import toy_2chain, toy_2chain_groth16
from davinci_tpu.circuits.voteverifier import VoteVerifierParams
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer.pipeline import InMemoryChain, ProcessInfo, Sequencer
from davinci_tpu.sequencer.provers import ProtocolProvers, ProverModes
from davinci_tpu.spec import state_root
from davinci_tpu.storage import MemoryKV, Storage

N_VOTES = 2
HASH_BYTES = 16  # batch-hash truncation: must embed in the toy outer Fr
# adicity >= 18: the aggregator circuit is keccak-dominated (~216k
# constraints -> 2^18 NTT domain on the OUTER Fr = inner p)
CHAIN_M = 18


@pytest.fixture(scope="module")
def prove_pipeline(tmp_path_factory):
    t = toy_2chain(CHAIN_M)
    inner_g16, outer_g16 = toy_2chain_groth16(CHAIN_M)
    inner = t["inner"]
    params = VoteVerifierParams(
        inner_ctx=inner["ctx"],
        inner_vk=None,
        sig_spec=inner["g1"],
        native_r=inner["r"],
        include_inner_proof=False,
        include_signature=False,
        hash_native=True,
    )
    store = ArtifactStore(tmp_path_factory.mktemp("artifacts"))
    provers = ProtocolProvers(
        params,
        store=store,
        modes=ProverModes(
            vote="prove", aggregate="prove", state_transition="prove"
        ),
        n_votes_agg=N_VOTES,
        curves={"c2": inner["ctx"].name, "c3": t["ctx6"].name},
        g16s={inner["ctx"].name: inner_g16, t["ctx6"].name: outer_g16},
        agg_overrides={
            "native_r": t["ctx6"].r,
            "inner_ctx": inner["ctx"],
            "hash_bytes": HASH_BYTES,
        },
        c4_overrides={"hash_bytes": HASH_BYTES},
    )

    rng = random.Random(0xF40)
    pub, priv = generate_key(rng)
    pid = 778
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
        votes_per_batch=N_VOTES,
    )
    seq.register_process(info, priv_key=priv)

    for i in range(N_VOTES):
        choice = [0] * protocol.FIELDS_PER_BALLOT
        choice[i % 2] = 1
        b = Ballot.encrypt(choice, pub, rng.randrange(1, 2**200))
        seq.submit_ballot(
            pid,
            rng.randrange(2**160),
            b,
            protocol.VOTE_ID_MIN + rng.randrange(2**40),
            client={"inputs_hash": hex(rng.randrange(1, inner["r"]))},
        )
    return seq, chain, pid, provers


def test_prove_tier_votes(prove_pipeline):
    seq, chain, pid, provers = prove_pipeline
    seq.tick_ballot(max_items=4)
    items = seq.storage.verified_ballots.next(4)
    assert len(items) == N_VOTES
    for s, it in items:
        vp = it["vote_proof"]
        assert vp["proven"] is True and "proof" in vp
        # the stored proof natively re-verifies (tick_aggregate's check)
        assert provers.verify_vote(vp)
        seq.storage.verified_ballots.release(s)


def test_prove_tier_aggregate_transition_onchain(prove_pipeline):
    seq, chain, pid, provers = prove_pipeline
    seq.tick_ballot(max_items=4)
    seq.tick_aggregate()
    got = seq.storage.agg_batches.next(1)
    assert got, "aggregation did not run"
    s, batch = got[0]
    assert batch["proof"]["proven"] is True
    assert batch["proof"]["count"] == N_VOTES
    assert "proof" in batch["proof"]
    seq.storage.agg_batches.release(s)

    seq.tick_transition(rng=random.Random(5))
    got = seq.storage.transition_batches.next(1)
    assert got, "transition did not run"
    s, tr = got[0]
    assert tr["proof"]["proven"] is True
    assert "proof" in tr["proof"]
    seq.storage.transition_batches.release(s)

    seq.tick_onchain()
    assert len(chain.transitions) == 1
    assert chain.transitions[0][3]["kind"] == "state_transition"
    assert chain.transitions[0][3]["proven"] is True
