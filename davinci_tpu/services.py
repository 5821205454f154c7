"""Service daemons: process monitor, census importers, state-sync wiring.

Role parity: reference service/ — `ProcessMonitor` (process_monitor.go:
44-459: polls chain events, registers new processes, reacts to status/
census/state-root changes), `CensusDownloader` (census_service.go:91-438:
async census fetch with retries + working->published lifecycle), and the
census importer plugins (census/importer.go:19-49: JSON snapshot, GraphQL,
on-chain dynamic).

The chain boundary here is the InMemoryChain fake (no egress in this
environment); importers consume file/dict snapshots and callback sources,
matching the reference's plugin seam so a real transport drops in.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass

from davinci_tpu import log
from davinci_tpu.census import CensusDB


# ---------------------------------------------------------------------------
# Census importers (reference census/importer.go)
# ---------------------------------------------------------------------------


class JSONSnapshotImporter:
    """Import a static census from a JSON snapshot:
    {"participants": [{"address": "0x..", "weight": 1}, ...]}
    (reference census/json.go)."""

    def __init__(self, censusdb: CensusDB):
        self.db = censusdb

    def import_snapshot(self, data: str | dict, census_id: str | None = None):
        if isinstance(data, str):
            data = json.loads(data)
        ref = self.db.new(census_id)
        n = 0
        for p in data["participants"]:
            addr = p["address"]
            if isinstance(addr, str):
                addr = int(addr, 16)
            self.db.insert(ref.census_id, addr, int(p.get("weight", 1)))
            n += 1
        log.infow("census.import.json", census=ref.census_id, participants=n)
        return ref

    def import_file(self, path: str, census_id: str | None = None):
        with open(path) as f:
            return self.import_snapshot(f.read(), census_id)


GRAPHQL_WEIGHT_QUERY = """\
query GetWeightChangeEvents($first: Int!, $skip: Int!) {
  weightChangeEvents(
    first: $first
    skip: $skip
    orderBy: blockNumber
    orderDirection: asc
  ) {
    account { id }
    previousWeight
    newWeight
  }
}"""


class GraphQLImporter:
    """GraphQL census importer (reference census/graphql.go): pages
    `weightChangeEvents` from a subgraph endpoint, folds them into final
    per-account weights (last newWeight wins; zero removes), and builds
    the census.  Speaks plain HTTP JSON — tested against a local stub
    server (this environment has no egress)."""

    def __init__(self, censusdb: CensusDB, endpoint: str,
                 page_size: int = 1000, timeout: float = 30.0,
                 query: str = GRAPHQL_WEIGHT_QUERY):
        self.db = censusdb
        self.endpoint = endpoint
        self.page_size = page_size
        self.timeout = timeout
        self.query = query

    def _fetch_page(self, skip: int) -> list:
        import urllib.request

        payload = json.dumps({
            "query": self.query,
            "variables": {"first": self.page_size, "skip": skip},
        }).encode()
        req = urllib.request.Request(
            self.endpoint, data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = json.loads(resp.read())
        if out.get("errors"):
            raise RuntimeError(
                f"graphql: {out['errors'][0].get('message', 'error')}"
            )
        return out["data"]["weightChangeEvents"]

    def fetch_weights(self) -> dict:
        """All pages -> {address(int): weight(int)} final state."""
        weights: dict = {}
        skip = 0
        while True:
            events = self._fetch_page(skip)
            if not events:
                break
            for ev in events:
                addr = int(ev["account"]["id"], 16)
                w = int(ev["newWeight"])
                if w == 0:
                    weights.pop(addr, None)
                else:
                    weights[addr] = w
            if len(events) < self.page_size:
                break
            skip += len(events)
        return weights

    def import_all(self, census_id: str | None = None):
        weights = self.fetch_weights()
        ref = self.db.new(census_id)
        for addr in sorted(weights):
            self.db.insert(ref.census_id, addr, weights[addr])
        log.infow(
            "census.import.graphql", census=ref.census_id,
            participants=len(weights), endpoint=self.endpoint,
        )
        return ref


class CallbackImporter:
    """Dynamic importer: pulls (address, weight) batches from a source
    callable until exhausted — the seam the reference's GraphQL
    (census3-bigquery) and on-chain importers plug into
    (census/graphql.go, census/importer.go:19-49)."""

    def __init__(self, censusdb: CensusDB, source, batch_size: int = 512):
        self.db = censusdb
        self.source = source  # source(offset, limit) -> list[(addr, weight)]
        self.batch_size = batch_size

    def import_all(self, census_id: str | None = None):
        ref = self.db.new(census_id)
        off = 0
        while True:
            batch = self.source(off, self.batch_size)
            if not batch:
                break
            for addr, weight in batch:
                self.db.insert(ref.census_id, addr, weight)
            off += len(batch)
        log.infow("census.import.dynamic", census=ref.census_id, total=off)
        return ref


# ---------------------------------------------------------------------------
# Process monitor (reference service/process_monitor.go)
# ---------------------------------------------------------------------------


@dataclass
class MonitorStats:
    new_processes: int = 0
    ended_processes: int = 0
    root_updates: int = 0


class ProcessMonitor:
    """Polls the chain for process lifecycle changes and drives the
    sequencer: registers newly created processes, flags ended ones for the
    finalizer, and surfaces state-root divergence (the state-sync trigger).
    """

    def __init__(self, chain, sequencer, interval: float = 1.0):
        self.chain = chain
        self.seq = sequencer
        self.interval = interval
        self.stats = MonitorStats()
        self._known: dict[int, dict] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # one scan — deterministic for tests (reference monitor loop body)
    def tick(self):
        for pid, info in list(self.chain.processes.items()):
            prev = self._known.get(pid)
            if prev is None:
                self._known[pid] = {
                    "ended": info.ended,
                    "root": info.state_root,
                }
                if pid not in self.seq.states:
                    try:
                        self.seq.register_process(info)
                        self.stats.new_processes += 1
                        log.infow("monitor.new_process", pid=pid)
                    except AssertionError:
                        # root mismatch: a foreign-state process — needs
                        # state sync before we can serve it
                        log.warnw("monitor.root_mismatch", pid=pid)
                continue
            if info.ended and not prev["ended"]:
                prev["ended"] = True
                self.stats.ended_processes += 1
                log.infow("monitor.process_ended", pid=pid)
            if info.state_root != prev["root"]:
                prev["root"] = info.state_root
                self.stats.root_updates += 1

    def start(self):
        def loop():
            while not self._stop.is_set():
                try:
                    self.tick()
                except Exception as e:  # monitor must not die
                    log.errorw("monitor.tick_error", error=str(e))
                self._stop.wait(self.interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
