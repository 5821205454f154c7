"""Master/worker proving farm: jobs over the real API surface, failure
accounting + bans, auth tokens."""

import random
import time

import pytest

from davinci_tpu import spec
from davinci_tpu.api import API
from davinci_tpu.census import CensusDB
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer import DevStubProvers, InMemoryChain, Sequencer
from davinci_tpu.sequencer.pipeline import ProcessInfo
from davinci_tpu.storage import MemoryKV, Storage, VoteIDStatus
from davinci_tpu.workers import (
    JobsManager,
    WorkerClient,
    WorkerManager,
    auth_token,
    check_auth_token,
    worker_uuid,
)


@pytest.fixture
def env():
    r = random.Random(66)
    pub, priv = generate_key(r)
    pid = 4
    info = ProcessInfo(
        process_id=pid,
        census_origin=1,
        ballot_mode=0,
        encryption_key=(pub.x, pub.y),
        state_root=spec.state_root(pid, 1, pub.x, pub.y, 0),
    )
    chain = InMemoryChain()
    chain.create_process(info)
    seq = Sequencer(Storage(MemoryKV()), chain)
    seq.register_process(info, priv_key=priv)
    wm = WorkerManager("master-seed", ban_seconds=0.2)
    jm = JobsManager(seq.storage, wm)
    api = API(seq, CensusDB(), jobs_manager=jm)
    return api, seq, jm, wm, pid, pub, r


def _submit_votes(seq, pid, pub, r, n):
    vids = []
    for _ in range(n):
        b = Ballot.encrypt([1] * 8, pub, r.randrange(1, 2**200))
        vid = spec.VOTE_ID_MIN + r.randrange(2**40)
        seq.submit_ballot(pid, r.randrange(2**160), b, vid)
        vids.append(vid)
    return vids


def test_worker_processes_jobs(env):
    api, seq, jm, wm, pid, pub, r = env
    vids = _submit_votes(seq, pid, pub, r, 3)

    transport = lambda m, p, b: api.dispatch(m, p, b)
    wid = worker_uuid("master-seed", "worker-1")
    worker = WorkerClient(wid, transport, DevStubProvers())

    while worker.tick():
        pass

    for v in vids:
        assert seq.storage.vote_status(pid, v) == VoteIDStatus.VERIFIED
    snap = api.dispatch("GET", "/sequencer/workers", None)["workers"]
    assert snap[wid]["success"] == 3


def test_failing_worker_gets_banned(env):
    api, seq, jm, wm, pid, pub, r = env
    _submit_votes(seq, pid, pub, r, 5)

    class FailingProvers:
        def prove_vote(self, _):
            raise RuntimeError("boom")

    transport = lambda m, p, b: api.dispatch(m, p, b)
    wid = worker_uuid("master-seed", "bad-worker")
    worker = WorkerClient(wid, transport, FailingProvers())

    for _ in range(3):
        worker.tick()
    assert not wm.allowed(wid)
    assert jm.get_job(wid) is None  # banned: no jobs handed out
    # ban expires (test uses 0.2s)
    time.sleep(0.25)
    assert wm.allowed(wid)
    # failed jobs returned to the queue for retry by good workers
    seq.storage.pending_ballots.release_stale()
    good = WorkerClient(
        worker_uuid("master-seed", "good"), transport, DevStubProvers()
    )
    n = 0
    while good.tick():
        n += 1
    assert n == 5


def test_auth_tokens():
    seed = "s3cret"
    tok = auth_token(seed, "w1", time.time() + 60)
    assert check_auth_token(seed, "w1", tok)
    assert not check_auth_token(seed, "w2", tok)
    assert not check_auth_token("other", "w1", tok)
    expired = auth_token(seed, "w1", time.time() - 1)
    assert not check_auth_token(seed, "w1", expired)
