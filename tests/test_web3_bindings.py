"""Process-registry contract bindings against the local fake Ethereum
node (reference web3/contracts.go + web3/process.go over a real
endpoint): ABI wire bytes, typed-tx signing/decoding, event monitoring,
blob-sidecar submission, and the full sequencer pipeline running over
the HTTP JSON-RPC rim instead of InMemoryChain."""

import random

from davinci_tpu import spec
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer import Sequencer
from davinci_tpu.sequencer.pipeline import ProcessInfo
from davinci_tpu.storage import MemoryKV, Storage, VoteIDStatus
from davinci_tpu.web3.contracts import (
    STATUS_ENDED,
    STATUS_RESULTS,
    ProcessRegistry,
    RpcChain,
)
from davinci_tpu.web3.fakenode import FakeEthNode
from davinci_tpu.web3.rpc import JsonRpcClient

PRIV = 0x51EA1ED0C0FFEE0DDF00DBA5EBA11AD11B17E5C0DE5EED5EA15EEDBEEFCAFE1


def _node_and_registry():
    node = FakeEthNode()
    server = node.serve()
    rpc = JsonRpcClient(f"http://127.0.0.1:{server.server_address[1]}/")
    reg = ProcessRegistry(rpc, FakeEthNode.REGISTRY_ADDR, PRIV)
    return node, server, reg


def test_registry_binding_lifecycle():
    node, server, reg = _node_and_registry()
    try:
        pid = reg.create_process(1, 7, (11, 22), census_root=33,
                                 state_root=44)
        assert pid == 1
        p = reg.get_process(pid)
        assert p["encryption_key"] == (11, 22)
        assert p["state_root"] == 44 and p["census_root"] == 33
        assert p["results"] is None

        # transition: wrong root reverts, right root advances
        import pytest

        with pytest.raises(RuntimeError):
            reg.submit_state_transition(
                pid, b"proof",
                _inputs(999, 55),
            )
        reg.submit_state_transition(pid, b"proof", _inputs(44, 55))
        assert reg.get_process(pid)["state_root"] == 55

        # results only after ended
        with pytest.raises(RuntimeError):
            reg.set_process_results(pid, b"p", _results([1, 2]))
        reg.set_process_status(pid, STATUS_ENDED)
        reg.set_process_results(pid, b"p", _results([1, 2]))
        p = reg.get_process(pid)
        assert p["status"] == STATUS_RESULTS and p["results"] == [1, 2]

        events = [e["event"] for e in reg.get_logs()]
        assert events == ["created", "root", "status", "results"]
    finally:
        server.shutdown()


def _inputs(rb, ra):
    from davinci_tpu.web3 import abi

    return abi.encode_args(["uint256", "uint256"], [rb, ra])


def _results(vals):
    from davinci_tpu.web3 import abi

    return abi.encode_args(["uint256[]"], [vals])


def test_blob_sidecar_submission():
    """Type-3 submission: the fake node re-derives the versioned hash
    from the decoded sidecar commitment and checks cell-proof counts."""
    node, server, reg = _node_and_registry()
    try:
        pid = reg.create_process(1, 0, (1, 2), state_root=10)
        blob = b"\x00" * (4096 * 32)
        commitment = bytes([0xC0]) + b"\x00" * 47  # compressed infinity
        proofs = [commitment] * 128
        reg.submit_state_transition(
            pid, b"pf", _inputs(10, 20), [(blob, commitment, proofs)]
        )
        assert reg.get_process(pid)["state_root"] == 20

        import pytest

        # short proof list: client-side structural guard
        with pytest.raises(ValueError):
            reg.submit_state_transition(
                pid, b"pf", _inputs(20, 30), [(blob, commitment, proofs[:100])]
            )
        # wrong blob size: consensus-side check -> tx reverts
        with pytest.raises(RuntimeError):
            reg.submit_state_transition(
                pid, b"pf", _inputs(20, 30),
                [(blob[:-32], commitment, proofs)],
            )
        assert reg.get_process(pid)["state_root"] == 20  # unchanged
    finally:
        server.shutdown()


def test_pipeline_over_rpc_chain():
    """The sequencer pipeline end-to-end with RpcChain over the HTTP
    JSON-RPC rim: votes -> aggregate -> transition (submitted as a
    contract call) -> settle -> finalize with on-chain results."""
    r = random.Random(5)
    pub, priv = generate_key(r)
    node, server, reg = _node_and_registry()
    try:
        chain = RpcChain(reg)
        pid = 1
        info = ProcessInfo(
            process_id=pid, census_origin=1, ballot_mode=0,
            encryption_key=(pub.x, pub.y),
            state_root=spec.state_root(pid, 1, pub.x, pub.y, 0),
        )
        chain.create_process(info)
        seq = Sequencer(Storage(MemoryKV()), chain, batch_time_window=0.0)
        seq.register_process(info, priv_key=priv)

        vids = []
        for i in range(2):
            b = Ballot.encrypt(
                [1, 0, 0, 0, 0, 0, 0, 0], pub, r.randrange(1, 2**200)
            )
            vid = spec.VOTE_ID_MIN + r.randrange(2**40)
            seq.submit_ballot(pid, r.randrange(2**160), b, vid)
            vids.append(vid)
        seq.tick_ballot()
        seq.tick_aggregate()
        seq.tick_transition(rng=r)
        seq.tick_onchain()
        assert all(
            seq.storage.vote_status(pid, v) == VoteIDStatus.SETTLED
            for v in vids
        )
        # the root advanced ON CHAIN
        assert reg.get_process(pid)["state_root"] == seq.states[pid].root

        chain.end_process(pid)
        seq.tick_finalizer(rng=r)
        p = reg.get_process(pid)
        assert p["status"] == STATUS_RESULTS
        assert p["results"][0] == 2  # both votes chose option 0
    finally:
        server.shutdown()
