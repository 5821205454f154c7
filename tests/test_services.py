"""Service daemons: process monitor + census importers + config env
(reference service/process_monitor.go, census/importer.go,
cmd/davinci-sequencer/config.go roles)."""

import json

import pytest

from davinci_tpu.census import CensusDB
from davinci_tpu.config import Config
from davinci_tpu.elgamal import generate_key
from davinci_tpu.sequencer.pipeline import InMemoryChain, ProcessInfo, Sequencer
from davinci_tpu.services import (
    CallbackImporter,
    JSONSnapshotImporter,
    ProcessMonitor,
)
from davinci_tpu.spec import state_root
from davinci_tpu.storage import MemoryKV, Storage


def _mk_chain_seq(rng_seed=3):
    import random

    rng = random.Random(rng_seed)
    pub, priv = generate_key(rng)
    chain = InMemoryChain()
    seq = Sequencer(Storage(MemoryKV()), chain)
    return chain, seq, pub


def test_process_monitor_registers_and_tracks():
    chain, seq, pub = _mk_chain_seq()
    mon = ProcessMonitor(chain, seq)
    mon.tick()
    assert mon.stats.new_processes == 0

    pid = 9
    chain.create_process(
        ProcessInfo(
            process_id=pid,
            census_origin=1,
            ballot_mode=0,
            encryption_key=(pub.x, pub.y),
            state_root=state_root(pid, 1, pub.x, pub.y, 0),
        )
    )
    mon.tick()
    assert mon.stats.new_processes == 1
    assert pid in seq.states

    chain.end_process(pid)
    mon.tick()
    assert mon.stats.ended_processes == 1

    chain.processes[pid].state_root = 12345
    mon.tick()
    assert mon.stats.root_updates == 1


def test_json_snapshot_importer():
    db = CensusDB()
    imp = JSONSnapshotImporter(db)
    snap = {
        "participants": [
            {"address": "0xabc123", "weight": 2},
            {"address": "0xdef456"},
            {"address": 777, "weight": 5},
        ]
    }
    ref = imp.import_snapshot(json.dumps(snap))
    root = db.publish(ref.census_id)
    proof = db.proof_by_root(root, 0xABC123)
    assert proof["weight"] == 2
    assert CensusDB.verify_proof(proof)


def test_callback_importer_paginates():
    db = CensusDB()
    rows = [(1000 + i, 1) for i in range(25)]

    def source(offset, limit):
        return rows[offset : offset + limit]

    imp = CallbackImporter(db, source, batch_size=10)
    ref = imp.import_all()
    assert db.by_id[ref.census_id].tree.size == 25


def test_graphql_importer_pages_and_folds():
    """GraphQL transport against a local stub subgraph: pagination,
    last-newWeight-wins folding, zero-weight removal (reference
    census/graphql.go weightChangeEvents protocol)."""
    import http.server
    import threading

    from davinci_tpu.services import GraphQLImporter

    events = (
        [{"account": {"id": hex(2000 + i)}, "previousWeight": "0",
          "newWeight": "1"} for i in range(13)]
        + [{"account": {"id": hex(2003)}, "previousWeight": "1",
            "newWeight": "9"}]       # update wins
        + [{"account": {"id": hex(2007)}, "previousWeight": "1",
            "newWeight": "0"}]       # removal
    )
    seen_pages = []

    class Stub(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            first = body["variables"]["first"]
            skip = body["variables"]["skip"]
            seen_pages.append((first, skip))
            page = events[skip : skip + first]
            data = json.dumps({"data": {"weightChangeEvents": page}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Stub)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        db = CensusDB()
        imp = GraphQLImporter(
            db, f"http://127.0.0.1:{server.server_address[1]}/subgraph",
            page_size=6,
        )
        ref = imp.import_all()
        tree = db.by_id[ref.census_id].tree
        assert tree.size == 12  # 13 inserts, 1 removed
        assert len(seen_pages) >= 3  # paginated
        root = db.publish(ref.census_id)
        proof = db.proof_by_root(root, 2003)
        assert proof["weight"] == 9
    finally:
        server.shutdown()


def test_config_env_resolution(monkeypatch):
    monkeypatch.setenv("DAVINCI_API_PORT", "9999")
    monkeypatch.setenv("DAVINCI_FORCE_CLEANUP", "true")
    monkeypatch.setenv("DAVINCI_BATCH_TIME_WINDOW", "12.5")
    cfg = Config.from_env(worker_name="w7")
    assert cfg.api_port == 9999
    assert cfg.force_cleanup is True
    assert cfg.batch_time_window == 12.5
    assert cfg.worker_name == "w7"  # explicit override wins
    assert cfg.votes_per_batch == 60  # default


def test_onchain_dynamic_importer_incremental_and_scoped():
    """Reference census/importer.go third plugin: chain-scoped identity,
    incremental import cursor, weight updates, per-root frozen snapshots."""
    from davinci_tpu.census import CensusDB
    from davinci_tpu.services import CensusImporter, OnchainDynamicImporter

    CONTRACT = 0xDEADBEEF00000000000000000000000000000001
    events = [(0xA1, 1), (0xA2, 2), (0xA3, 1)]

    def source(contract, offset, limit):
        assert contract == CONTRACT
        return events[offset : offset + limit]

    db = CensusDB()
    imp = OnchainDynamicImporter(db, chain_id=11155111, source=source,
                                 batch_size=2)
    census = {"uri": f"onchain://{CONTRACT:#x}"}
    ref, processed = imp.import_census(census, 0)
    assert processed == 3
    assert ref.census_id == imp.scoped_id(CONTRACT)
    root1 = ref.tree.root
    assert root1 in db.by_root
    p = db.proof_by_root(root1, 0xA2)
    assert CensusDB.verify_proof(p) and p["weight"] == 2

    # dynamic update lands on chain: one weight change + one new voter
    events.extend([(0xA2, 7), (0xA4, 3)])
    ref, processed = imp.import_census(census, processed)
    assert processed == 5
    root2 = ref.tree.root
    assert root2 != root1
    # the old snapshot still proves at the old root; the new at the new
    assert db.proof_by_root(root1, 0xA2)["weight"] == 2
    assert db.proof_by_root(root2, 0xA2)["weight"] == 7
    assert db.proof_by_root(root2, 0xA4)["weight"] == 3

    # expected-root pinning
    try:
        imp.import_census({"uri": census["uri"], "root": 1234}, processed)
        assert False, "root mismatch must raise"
    except ValueError:
        pass


def test_census_importer_dispatch(tmp_path):
    """Plugin routing + by-root dedupe + CSP no-op (importer.go)."""
    import json as _json

    from davinci_tpu import spec as protocol
    from davinci_tpu.census import CensusDB
    from davinci_tpu.services import (
        CensusImporter,
        JSONSnapshotImporter,
        OnchainDynamicImporter,
    )

    db = CensusDB()
    snap = {"participants": [{"address": "0xb1", "weight": 1},
                             {"address": "0xb2", "weight": 4}]}
    p = tmp_path / "census.json"
    p.write_text(_json.dumps(snap))

    onchain = OnchainDynamicImporter(
        db, chain_id=1, source=lambda c, o, l: [] if o else [(0xC1, 1)]
    )
    disp = CensusImporter(db, [onchain, JSONSnapshotImporter(db)])

    ref, n = disp.import_census({"uri": str(p)})
    assert n == 2 and ref.tree.root in db.by_root

    ref2, n2 = disp.import_census({"uri": "onchain://0xabc"})
    assert n2 == 1

    # by-root dedupe: same root short-circuits to the cached ref
    ref3, n3 = disp.import_census({"uri": str(p), "root": ref.tree.root})
    assert ref3.tree.root == ref.tree.root

    # CSP origins are never downloaded
    got, n4 = disp.import_census(
        {"origin": protocol.CENSUS_ORIGIN_CSP_EDDSA_BJJ}, 9
    )
    assert got is None and n4 == 9
