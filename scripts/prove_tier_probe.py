#!/usr/bin/env python3
"""Staged timing probe for the all-prove pipeline tier (what
tests/test_pipeline_prove_tier.py runs): toy-2chain c2 prove, c3
setup+prove on the toy outer curve, c4 setup+prove on BN254 — each phase
printed as it completes, so slow phases are attributable."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import random

from davinci_tpu import spec as protocol
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.toycurve import toy_2chain, toy_2chain_groth16
from davinci_tpu.circuits.voteverifier import VoteVerifierParams
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer.pipeline import InMemoryChain, ProcessInfo, Sequencer
from davinci_tpu.sequencer.provers import ProtocolProvers, ProverModes
from davinci_tpu.spec import state_root
from davinci_tpu.storage import MemoryKV, Storage

CHAIN_M = 18
HASH_BYTES = 16
N_VOTES = 2

t0 = time.time()


def t(msg):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)


t_chain = toy_2chain(CHAIN_M)
inner_g16, outer_g16 = toy_2chain_groth16(CHAIN_M)
inner = t_chain["inner"]
t("toy 2-chain built")

params = VoteVerifierParams(
    inner_ctx=inner["ctx"],
    inner_vk=None,
    sig_spec=inner["g1"],
    native_r=inner["r"],
    include_inner_proof=False,
    include_signature=False,
    hash_native=True,
)
store = ArtifactStore(tempfile.mkdtemp())
provers = ProtocolProvers(
    params,
    store=store,
    modes=ProverModes(vote="prove", aggregate="prove", state_transition="prove"),
    n_votes_agg=N_VOTES,
    curves={"c2": inner["ctx"].name, "c3": t_chain["ctx6"].name},
    g16s={inner["ctx"].name: inner_g16, t_chain["ctx6"].name: outer_g16},
    agg_overrides={
        "native_r": t_chain["ctx6"].r,
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
t("pipeline seeded")

seq.tick_ballot(max_items=4)
t("tick_ballot done (c2 proves)")

seq.tick_aggregate()
t("tick_aggregate done (c3 setup+prove)")

seq.tick_transition(rng=random.Random(5))
t("tick_transition done (c4 setup+prove)")

seq.tick_onchain()
t("tick_onchain done")
got = chain.transitions
assert got and got[0][3]["proven"] is True, got
t("PROVE-TIER PIPELINE OK: proven transition on chain fake")
