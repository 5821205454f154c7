#!/usr/bin/env python3
"""Steady-state Groth16 prove timing on the full-size ballot-proof
circuit (BN254, ~100k constraints): build witness, prove TWICE, report
per-phase and per-prove wall times.  Distinguishes XLA-compile /
cache-load cost (first prove) from steady-state throughput (second) —
the north-star proofs/min metric counts the steady state, like gnark's
InfoTime logs (reference README.md:306-312)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davinci_tpu.ballotmode import BallotMode
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.ballotproof import build_ballot_proof_circuit, make_ballot
from davinci_tpu.elgamal import generate_key


def main():
    t0 = time.time()
    rng = random.Random(0xF3)
    store = ArtifactStore(os.environ.get("DAVINCI_ARTIFACTS_DIR", "/tmp/dvt-full"))
    bm = BallotMode()
    pub, _ = generate_key(rng)
    bw = make_ballot(
        12345, bm, (pub.x, pub.y), rng.randrange(2**160),
        rng.randrange(1, 2**200), [1, 0, 0, 0, 0, 0, 0, 0],
    )
    t1 = time.time()
    cs1 = build_ballot_proof_circuit(bw)
    t2 = time.time()
    print(f"[build {t2-t1:7.1f}s] circuit-1: {len(cs1.constraints):,} constraints")
    rt1 = store.load_or_setup("ballotproof-full", "bn254", cs1)
    t3 = time.time()
    print(f"[load  {t3-t2:7.1f}s] artifacts")
    for i in range(3):
        ta = time.time()
        proof = rt1.g16.prove(rt1.pk, cs1)
        tb = time.time()
        print(f"[prove#{i} {tb-ta:7.1f}s]")
    ih = bw.inputs_hash()
    ok = rt1.g16.verify(rt1.vk, proof, [ih])
    print(f"[verify ok={ok}] total {time.time()-t0:7.1f}s")


if __name__ == "__main__":
    main()
