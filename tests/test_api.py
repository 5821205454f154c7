"""API layer: vote intake validation (signature + census), census routes,
status/stats — both in-process dispatch and over a real HTTP socket."""

import json
import random
import urllib.request

import pytest

from davinci_tpu import ethereum as eth
from davinci_tpu import spec
from davinci_tpu.api import API, ApiError, serve
from davinci_tpu.census import CensusDB
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.sequencer import InMemoryChain, Sequencer
from davinci_tpu.sequencer.pipeline import ProcessInfo
from davinci_tpu.storage import MemoryKV, Storage


@pytest.fixture
def env():
    r = random.Random(55)
    pub, priv = generate_key(r)
    pid = 3
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
    api = API(seq, CensusDB())
    return api, seq, pid, pub, r


def _make_vote_body(api, pid, pub, r, census_cid=None):
    eth_priv = r.randrange(1, eth.N)
    address = int.from_bytes(
        eth.address_from_pubkey(eth.pubkey_from_priv(eth_priv)), "big"
    )
    # census with this address
    cid = census_cid or api.new_census(body=None)["censusID"]
    api.add_participants(cid, body={"participants": [{"address": address, "weight": 1}]})
    root = int(api.publish_census(cid, body=None)["root"])
    proof = api.census_proof(str(root), str(address), body=None)["proof"]

    vote_id = spec.VOTE_ID_MIN + r.randrange(2**40)
    payload = vote_id.to_bytes(8, "big").rjust(32, b"\x00")
    rr, ss, rec = eth.sign_eth_prefixed(eth_priv, payload)

    ballot = Ballot.encrypt([1, 0, 0, 0, 0, 0, 0, 1], pub, r.randrange(1, 2**200))
    return {
        "processID": pid,
        "address": address,
        "voteID": vote_id,
        "weight": 1,
        "ballot": [str(c) for c in ballot.coords()],
        "signature": {"r": rr, "s": ss, "rec": rec},
        "censusProof": {"kind": "merkle", "proof": proof},
    }


def test_vote_intake_happy_path(env):
    api, seq, pid, pub, r = env
    body = _make_vote_body(api, pid, pub, r)
    out = api.dispatch("POST", "/votes", body)
    assert out["status"] == "pending"
    st = api.dispatch("GET", f"/votes/{body['voteID']}/process/{pid}/status", None)
    assert st["status"] == "pending"
    # duplicate rejected
    with pytest.raises(ApiError) as e:
        api.dispatch("POST", "/votes", body)
    assert e.value.code == 409


def test_vote_bad_signature_rejected(env):
    api, seq, pid, pub, r = env
    body = _make_vote_body(api, pid, pub, r)
    body["signature"]["s"] = int(body["signature"]["s"]) ^ 1
    with pytest.raises(ApiError) as e:
        api.dispatch("POST", "/votes", body)
    assert e.value.code == 401


def test_vote_wrong_census_rejected(env):
    api, seq, pid, pub, r = env
    body = _make_vote_body(api, pid, pub, r)
    body["censusProof"]["proof"]["weight"] = "99"
    with pytest.raises(ApiError) as e:
        api.dispatch("POST", "/votes", body)
    assert e.value.code == 401


def test_csp_census_vote(env):
    api, seq, pid, pub, r = env
    from davinci_tpu.csp import BabyJubJubEdDSA

    body = _make_vote_body(api, pid, pub, r)
    signer = BabyJubJubEdDSA(b"csp")
    p = signer.generate_proof(pid, body["address"], 1)
    sig = p.pop("signature")
    p["signature"] = {"r8x": sig.r8[0], "r8y": sig.r8[1], "s": sig.s}
    body["censusProof"] = {"kind": "csp", "proof": p}
    body["voteID"] = spec.VOTE_ID_MIN + 999
    payload = body["voteID"].to_bytes(8, "big").rjust(32, b"\x00")
    # re-sign the new voteID with a fresh eth key bound to the same address?
    # simpler: build a fresh vote with csp proof
    out = None
    eth_priv = r.randrange(1, eth.N)
    addr = int.from_bytes(
        eth.address_from_pubkey(eth.pubkey_from_priv(eth_priv)), "big"
    )
    p2 = signer.generate_proof(pid, addr, 1)
    sig2 = p2.pop("signature")
    p2["signature"] = {"r8x": sig2.r8[0], "r8y": sig2.r8[1], "s": sig2.s}
    rr, ss, rec = eth.sign_eth_prefixed(eth_priv, payload)
    body.update(
        address=addr,
        signature={"r": rr, "s": ss, "rec": rec},
        censusProof={"kind": "csp", "proof": p2},
    )
    out = api.dispatch("POST", "/votes", body)
    assert out["status"] == "pending"


def test_http_transport(env):
    api, seq, pid, pub, r = env
    server, thread = serve(api)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/info") as resp:
            info = json.loads(resp.read())
        assert info["name"] == "davinci-tpu"
        assert info["processes"] == 1

        body = _make_vote_body(api, pid, pub, r)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/votes",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        assert out["status"] == "pending"

        # static dashboard (reference api/api.go:29-32 /app webapp role)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/app") as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        assert "davinci-tpu sequencer" in page
        assert "/sequencer/stats" in page

        # host metrics (reference api/info.go:35-68 hostLoad)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/hostLoad"
        ) as resp:
            hl = json.loads(resp.read())
        assert set(hl) >= {"hostLoad1", "hostMemUsedPercent",
                           "hostDiskUsedPercent"}
        assert hl["hostMemUsedPercent"] > 0
        assert hl["hostDiskUsedPercent"].get("/", 0) > 0
    finally:
        server.shutdown()
