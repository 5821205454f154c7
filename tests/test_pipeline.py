"""Sequencer pipeline end-to-end over queues, state, blob codec, chain fake:
votes -> verify -> aggregate -> transition -> settle -> finalize."""

import random

import pytest

from davinci_tpu import spec
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer import InMemoryChain, Sequencer
from davinci_tpu.sequencer.pipeline import ProcessInfo
from davinci_tpu.state.blobcodec import parse_blob_data
from davinci_tpu.storage import MemoryKV, Storage, VoteIDStatus


def _setup(r, window=0.0):
    pub, priv = generate_key(r)
    from davinci_tpu.spec import state_root

    pid = 9
    info = ProcessInfo(
        process_id=pid,
        census_origin=1,
        ballot_mode=0,
        encryption_key=(pub.x, pub.y),
        state_root=state_root(pid, 1, pub.x, pub.y, 0),
    )
    chain = InMemoryChain()
    chain.create_process(info)
    seq = Sequencer(Storage(MemoryKV()), chain, batch_time_window=window)
    seq.register_process(info, priv_key=priv)
    return seq, chain, pid, pub, priv


def _vote(r, seq, pid, pub, msgs, address=None):
    b = Ballot.encrypt(msgs, pub, r.randrange(1, 2**200))
    addr = address if address is not None else r.randrange(2**160)
    vid = spec.VOTE_ID_MIN + r.randrange(2**40)
    seq.submit_ballot(pid, addr, b, vid)
    return vid, addr


def test_full_pipeline():
    r = random.Random(7)
    seq, chain, pid, pub, priv = _setup(r)

    vids = []
    for i in range(3):
        vid, _ = _vote(r, seq, pid, pub, [1, 0, i % 2, 0, 0, 0, 0, 1])
        vids.append(vid)

    seq.tick_ballot()
    assert all(
        seq.storage.vote_status(pid, v) == VoteIDStatus.VERIFIED for v in vids
    )
    seq.tick_aggregate()  # window=0 -> fires immediately
    assert seq.storage.agg_batches.size() == 1
    seq.tick_transition(rng=r)
    assert all(
        seq.storage.vote_status(pid, v) == VoteIDStatus.PROCESSED for v in vids
    )
    seq.tick_onchain()
    assert all(
        seq.storage.vote_status(pid, v) == VoteIDStatus.SETTLED for v in vids
    )
    assert chain.process(pid).state_root == seq.states[pid].root
    assert len(chain.blobs) == 1

    # blob parses back to the vote set
    parsed = parse_blob_data(bytes.fromhex(chain.blobs[0][1]))
    assert parsed["voters_count"] == 3
    assert {v["vote_id"] for v in parsed["votes"]} == set(vids)

    # finalize
    chain.end_process(pid)
    seq.tick_finalizer(rng=r)
    res = chain.process(pid).results
    assert res is not None
    assert res[0] == 3  # three votes with 1 in field 0
    assert res[7] == 3

    stats = seq.storage.stats(pid)
    assert stats["verified_votes"] == 3
    assert stats["settled_transitions"] == 1


def test_onchain_failure_rolls_back():
    r = random.Random(8)
    seq, chain, pid, pub, priv = _setup(r)
    _vote(r, seq, pid, pub, [1] * 8)
    seq.tick_ballot()
    seq.tick_aggregate()
    root0 = seq.states[pid].root  # pre-transition root... captured below
    seq.tick_transition(rng=r)
    root_after = seq.states[pid].root
    chain.fail_next = True
    seq.tick_onchain()
    # rolled back locally; item back in queue
    assert seq.states[pid].root != root_after
    assert chain.process(pid).state_root != root_after


def test_vote_overwrite_through_pipeline():
    r = random.Random(9)
    seq, chain, pid, pub, priv = _setup(r)
    vid1, addr = _vote(r, seq, pid, pub, [5, 0, 0, 0, 0, 0, 0, 0])
    seq.tick_ballot()
    seq.tick_aggregate()
    seq.tick_transition(rng=r)
    seq.tick_onchain()

    # same address votes again -> overwrite
    vid2, _ = _vote(r, seq, pid, pub, [2, 0, 0, 0, 0, 0, 0, 0], address=addr)
    seq.tick_ballot()
    seq.tick_aggregate()
    seq.tick_transition(rng=r)
    seq.tick_onchain()

    chain.end_process(pid)
    seq.tick_finalizer(rng=r)
    assert chain.process(pid).results[0] == 2  # overwritten, not 7


def test_stale_reservation_release():
    r = random.Random(10)
    seq, chain, pid, pub, priv = _setup(r)
    _vote(r, seq, pid, pub, [1] * 8)
    # reserve without completing (simulated crash mid-processing)
    got = seq.storage.pending_ballots.next(1)
    assert got
    assert seq.storage.pending_ballots.next(1) == []  # reserved
    seq.storage.clean_all_pending()
    assert len(seq.storage.pending_ballots.next(1)) == 1  # retryable again


def test_transition_sidecar_wiring(monkeypatch):
    """DAVINCI_CELL_PROOFS routes a version-1 sidecar (commitment + 128
    cell proofs) through the transition record to chain submission, where
    the structural guard runs (reference sequencer/onchain.go:162-173).
    Proof bytes are stubbed — real cell-proof math is tests/test_cells.py."""
    from davinci_tpu.blobs import cells as cells_mod
    from davinci_tpu.blobs import kzg as kzg_mod

    monkeypatch.setenv("DAVINCI_CELL_PROOFS", "1")
    monkeypatch.setattr(
        kzg_mod, "blob_to_commitment", lambda blob: b"\x01" * 48
    )
    monkeypatch.setattr(
        cells_mod,
        "compute_cell_proofs_device",
        lambda blob, cell_ids=None: [bytes([i]) * 48 for i in range(128)],
    )
    r = random.Random(21)
    seq, chain, pid, pub, priv = _setup(r)
    _vote(r, seq, pid, pub, [1] * 8)
    seq.tick_ballot()
    seq.tick_aggregate()
    seq.tick_transition(rng=r)
    seq.tick_onchain()
    assert len(chain.blobs) == 1
    _, _, sidecar = chain.blobs[0]
    assert sidecar["version"] == 1
    assert len(sidecar["cell_proofs"]) == 128
    assert sidecar["commitment"] == ("01" * 48)
