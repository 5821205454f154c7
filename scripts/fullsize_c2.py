#!/usr/bin/env python3
"""Full-size (production-parameter) vote-verifier pipeline exercise.

Stages (each timed; later stages need earlier ones):
  build   — real circuit-1 ballot proof, then the full circuit-2 build
            (BN254 inner pairing + secp256k1 ECDSA + keccak, lookup tier)
            and satisfiability check.  Host-only.
  setup   — Groth16 trusted setup for circuit 2 on BLS12-377 through the
            artifact store (cached under DAVINCI_ARTIFACTS_DIR).
  prove   — prove_committed on device + verify.

Usage:
  python scripts/fullsize_c2.py build            # CPU-pinned
  python scripts/fullsize_c2.py prove            # uses the TPU
Role parity: reference circuits/test/voteverifier full-size vectors +
RUN_CIRCUIT_TESTS tier (SURVEY.md §4).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE = sys.argv[1] if len(sys.argv) > 1 else "build"

# All stages run on the TPU: circuit-1 setup/prove and the satisfiability
# check use device ops, and XLA:CPU's compile time on the limb graphs is
# pathological at these sizes (>1h for the 2^17-domain prove).

import random

from davinci_tpu import curves as C
from davinci_tpu.ballotmode import BallotMode
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.ballotproof import (
    build_ballot_proof_circuit,
    make_ballot,
)
from davinci_tpu.circuits.voteverifier import (
    VoteVerifierParams,
    build_vote_verifier_circuit,
    make_vote_verifier_witness,
)
from davinci_tpu.elgamal import generate_key
from davinci_tpu.groth16 import Groth16
from davinci_tpu.pairing import bn254_pairing


def t(msg, t0):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)


def main():
    t0 = time.time()
    rng = random.Random(0xF3)
    store = ArtifactStore(os.environ.get("DAVINCI_ARTIFACTS_DIR", "/tmp/dvt-full"))

    # -- zero-rebuild prove path: serialized solved system + cached PK ----
    # (gnark compile-once/solve-anywhere role; survives process restarts
    # and machine recycles as long as the artifacts dir does)
    cid = None
    if STAGE == "prove":
        params_probe = VoteVerifierParams(
            inner_ctx=bn254_pairing, inner_vk=None, sig_spec=C.secp256k1,
            use_lookup=True,
        )
        cid = params_probe.circuit_id()
        solved = store.load_solved(cid, "witness")
        if solved is not None:
            t(f"solved system loaded: {len(solved.constraints):,} "
              f"constraints, {solved.num_variables:,} vars", t0)
            rt2 = store.load_or_setup(cid, "bls12_377", solved)
            t("circuit-2 PK/VK load", t0)
            for i in range(3):
                tp = time.time()
                proof = rt2.prove_committed_reuse(
                    solved, r_rand=7 + i, s_rand=9 + i
                )
                ok = rt2.verify_committed(proof, solved.public_values())
                assert ok
                t(
                    f"zero-rebuild prove_committed_reuse+verify #{i}: "
                    f"{time.time()-tp:.1f}s", t0,
                )
            return

    # --- circuit 1: real ballot proof (BN254) ---------------------------
    g16_1 = Groth16("bn254")
    bm = BallotMode()
    pub, _ = generate_key(rng)
    bw = make_ballot(
        12345, bm, (pub.x, pub.y), rng.randrange(2**160),
        rng.randrange(1, 2**200), [1, 0, 0, 0, 0, 0, 0, 0],
    )
    cs1 = build_ballot_proof_circuit(bw)
    t(f"circuit-1 build: {len(cs1.constraints):,} constraints", t0)
    rt1 = store.load_or_setup("ballotproof-full", "bn254", cs1)
    t("circuit-1 setup/load", t0)
    ih = bw.inputs_hash()
    import json
    import pathlib

    from davinci_tpu.groth16.serialize import proof_from_dict, proof_to_dict

    p1_cache = pathlib.Path(store.root) / "ballotproof-full" / "proof1.json"
    if p1_cache.exists():
        proof1 = proof_from_dict(
            json.loads(p1_cache.read_text()), rt1.g16.g1, rt1.g16.g2
        )
        t("circuit-1 proof loaded from cache", t0)
    else:
        proof1 = rt1.prove(cs1)
        p1_cache.write_text(json.dumps(proof_to_dict(proof1)))
        t("circuit-1 prove", t0)
    assert rt1.verify(proof1, [ih])
    t("circuit-1 verify", t0)

    params = VoteVerifierParams(
        inner_ctx=bn254_pairing,
        inner_vk=rt1.vk,
        sig_spec=C.secp256k1,
        use_lookup=True,
    )
    priv = rng.randrange(1, C.secp256k1.r)

    def eth_sign(d, e_int):
        from davinci_tpu.ethereum import sign

        r, s, _ = sign(d, e_int.to_bytes(32, "big"))
        return r, s

    w = make_vote_verifier_witness(
        params, process_id=12345, priv_sig_key=priv, inputs_hash=ih,
        ballot_proof=proof1, vote_id=bw.vote_id, sign_fn=eth_sign,
    )

    def build_fn(challenge, blind):
        return build_vote_verifier_circuit(params, w, challenge, blind)

    cs2 = build_fn(0, 1)
    t(
        f"circuit-2 FULL build (lookup tier): {len(cs2.constraints):,} "
        f"constraints, {cs2.num_variables:,} variables", t0,
    )
    from collections import Counter

    tally = Counter(lbl.split("/")[0] for lbl in cs2._labels.values())
    unlabeled = len(cs2.constraints) - len(cs2._labels)
    for scope, cnt in tally.most_common():
        print(f"    {scope}: {cnt:,}", flush=True)
    print(f"    (unlabeled incl. lookup finalize): {unlabeled:,}", flush=True)

    # persist the solved system: later prove runs (any process, any
    # machine with the artifacts dir) skip the builder entirely
    store.save_solved(params.circuit_id(), "witness", cs2)
    t("solved system persisted", t0)

    if STAGE == "build":
        # the phase-1 (challenge=0) build is unsat BY CONSTRUCTION in the
        # lookup argument (1/(gamma - v) hits inv(0)); satisfiability is
        # checked on a synthetic nonzero challenge outside the table range
        cs_chk = build_fn(1 << 20, 1)
        ok = cs_chk.check_satisfied()
        t(f"satisfiability (test challenge): {ok}", t0)
        assert ok, cs_chk.first_unsatisfied()
        return

    rt2 = store.load_or_setup(params.circuit_id(), "bls12_377", cs2)
    t("circuit-2 setup/load", t0)
    if STAGE == "setup":
        return

    tp = time.time()
    proof2 = rt2.prove_committed(build_fn, r_rand=7, s_rand=9)
    t(f"circuit-2 prove_committed: {time.time()-tp:.1f}s", t0)
    tv = time.time()
    assert rt2.verify_committed(proof2, cs2.public_values())
    t(f"circuit-2 verify: {time.time()-tv:.1f}s", t0)
    # steady state: reuse the built system (fresh blind + in-place
    # challenge re-solve — zero Python constraint construction)
    for i in range(2):
        tp = time.time()
        proof3 = rt2.prove_committed_reuse(cs2, r_rand=11 + i, s_rand=13 + i)
        assert rt2.verify_committed(proof3, cs2.public_values())
        t(f"steady prove_committed_reuse+verify #{i}: {time.time()-tp:.1f}s", t0)


if __name__ == "__main__":
    main()
