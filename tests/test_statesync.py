"""State sync: a follower node reconstructs state purely from chain blobs;
metadata CIDs round-trip."""

import random

from davinci_tpu import spec
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.metadata import LocalMetadataProvider, compute_cid
from davinci_tpu.sequencer import InMemoryChain, Sequencer
from davinci_tpu.sequencer.pipeline import ProcessInfo
from davinci_tpu.state import State
from davinci_tpu.statesync import StateSync
from davinci_tpu.storage import MemoryKV, Storage


def test_follower_replays_blobs():
    r = random.Random(77)
    pub, priv = generate_key(r)
    pid = 12
    info = ProcessInfo(
        process_id=pid,
        census_origin=1,
        ballot_mode=0,
        encryption_key=(pub.x, pub.y),
        state_root=spec.state_root(pid, 1, pub.x, pub.y, 0),
    )
    chain = InMemoryChain()
    chain.create_process(info)

    producer = Sequencer(Storage(MemoryKV()), chain, batch_time_window=0.0)
    producer.register_process(info, priv_key=priv)

    # two batches through the producer
    for batch in range(2):
        for _ in range(2):
            b = Ballot.encrypt([1, 0, 0, 0, 0, 0, 0, 0], pub, r.randrange(1, 2**200))
            producer.submit_ballot(
                pid, r.randrange(2**160), b, spec.VOTE_ID_MIN + r.randrange(2**40)
            )
        producer.tick_ballot()
        producer.tick_aggregate()
        producer.tick_transition(rng=r)
        producer.tick_onchain()
    assert len(chain.blobs) == 2

    # follower starts from the genesis config and replays the chain
    follower = State(pid)
    follower.initialize(1, 0, (pub.x, pub.y))
    sync = StateSync(chain, {pid: follower})
    sync.tick()
    assert follower.root == chain.process(pid).state_root
    assert follower.root == producer.states[pid].root
    # results leaf reconstructed identically
    assert follower.results().coords() == producer.states[pid].results().coords()


def test_metadata_cid():
    storage = Storage(MemoryKV())
    provider = LocalMetadataProvider(storage)
    meta = {"title": "Election", "questions": [{"t": "Q1"}]}
    cid = provider.publish(meta)
    assert cid.startswith("b")
    assert provider.fetch(cid) == meta
    assert provider.fetch("b" + "a" * 58) is None
    # deterministic
    assert compute_cid(b"hello") == compute_cid(b"hello")
    assert compute_cid(b"hello") != compute_cid(b"hello2")
