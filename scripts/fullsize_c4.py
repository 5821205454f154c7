#!/usr/bin/env python3
"""Full-size (production-parameter) state-transition circuit build:
60 votes, 64-level state tree, 20-level census, EIP-4844 blob binding on
the full 4096-cell domain, lookup range-check tier.  Build +
satisfiability + labeled constraint counts (host-only — the prove tier
runs through the artifact store on the TPU like circuit 2).

Role parity: reference circuits/test/statetransition full-size vectors
(statetransition_test.go, RUN_CIRCUIT_TESTS tier; spec/params/params.go:
VotesPerBatch=60, StateTreeDepth=64).

Usage: python scripts/fullsize_c4.py [n_votes]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
N_VOTES = int(_pos[0]) if _pos else 60
AGGV = "--aggv" in sys.argv
CENSUS_LEVELS = 20
BLOB_BITS = 12


def t(msg, t0):
    print(f"[{time.time()-t0:8.1f}s] {msg}", flush=True)


def main():
    from davinci_tpu import fields as F
    from davinci_tpu import spec as protocol
    from davinci_tpu.ballotmode import BallotMode
    from davinci_tpu.census import CensusDB
    from davinci_tpu.circuits.blob_gadget import barycentric_eval_host
    from davinci_tpu.circuits.statetransition import (
        StateTransitionParams,
        StateTransitionWitness,
        _blob_domain,
        build_state_transition_circuit,
    )
    from davinci_tpu.elgamal import Ballot, generate_key
    from davinci_tpu.state import State, Vote, ballot_index_key

    t0 = time.time()
    rng = random.Random(0xC460)
    pub, _ = generate_key(rng)
    pid = 424260
    bm = BallotMode()
    st = State(pid)
    st.initialize(1, bm.pack(), (pub.x, pub.y))

    votes, ks = [], []
    for i in range(N_VOTES):
        choice = [0] * protocol.FIELDS_PER_BALLOT
        choice[i % protocol.FIELDS_PER_BALLOT] = 1
        k_enc = rng.randrange(1, 2**200)
        b = Ballot.encrypt(choice, pub, k_enc)
        k_re = rng.randrange(1, 2**200)
        reenc, _ = b.reencrypt(pub, k_re)
        votes.append(
            Vote(
                address=rng.randrange(2**160),
                ballot_index=ballot_index_key(i),
                vote_id=protocol.VOTE_ID_MIN + rng.randrange(2**40),
                ballot=b,
                reencrypted_ballot=reenc,
                weight=1,
            )
        )
        ks.append(k_re)
    t(f"{N_VOTES} encrypted+re-encrypted votes", t0)

    cdb = CensusDB()
    cdb.new("c")
    for v in votes:
        cdb.insert("c", v.address, v.weight)
    census_root = cdb.publish("c")
    tree = cdb.by_id["c"].tree
    cproofs = []
    for i in range(N_VOTES):
        _, sibs, acts, bits = tree.prove_circuit(i, CENSUS_LEVELS)
        cproofs.append(
            {
                "kind": "merkle",
                "siblings": sibs,
                "actives": acts,
                "index_bits": bits,
                "index": i,
            }
        )
    t(f"census (LeanIMT, {CENSUS_LEVELS} levels)", t0)

    batch = st.prepare_votes_batch(votes)
    t("prepare_votes_batch (64-level SMT transitions)", t0)

    # blob binding: cells exactly as state/blobcodec.pack_batch_blob
    cells = list(batch.new_results.coords()) + [len(batch.votes)]
    for v in batch.votes:
        cells += [v.vote_id, v.address, v.ballot_index, v.weight]
        cells += v.reencrypted_ballot.coords()
    dom = _blob_domain(BLOB_BITS)
    assert len(cells) <= len(dom), "blob overflow"
    data = cells + [0] * (len(dom) - len(cells))
    z = rng.randrange(F.BLS12_381_R)
    y = barycentric_eval_host(dom, data, z)
    t(f"blob barycentric eval ({len(cells)} cells, 2^{BLOB_BITS} domain)", t0)

    w = StateTransitionWitness(
        batch=batch,
        process_id=pid,
        ballot_mode_packed=bm.pack(),
        encryption_key=(pub.x, pub.y),
        census_origin=1,
        reenc_k=ks,
        inputs_hashes=[rng.randrange(1 << 250) for _ in votes],
        census_root=census_root,
        census_proofs=cproofs,
        blob_z=z,
        blob_y=y,
    )
    params = StateTransitionParams(
        n_votes=N_VOTES,
        n_levels=64,
        census_levels=CENSUS_LEVELS,
        include_blob=True,
        blob_domain_bits=BLOB_BITS,
        use_lookup=True,
    )
    if AGGV:
        # the PRODUCTION soundness core: emulated REAL BW6-761 Groth16
        # verification of the aggregator proof (statetransition.go:240)
        from dataclasses import replace

        from davinci_tpu.groth16 import ConstraintSystem as CS
        from davinci_tpu.groth16 import Groth16
        from davinci_tpu.pairing import PAIRINGS

        ctx6 = PAIRINGS["bw6_761"]
        outer = Groth16("bw6_761")
        params = replace(
            params, hash_bytes=31, verify_aggregator=True, agg_ctx=ctx6
        )
        bh = w.batch_hash(params)
        cs_agg = CS(ctx6.r)
        pub_in = cs_agg.pub_input(bh)
        s = cs_agg.priv_input(bh % 1009)
        cs_agg.assert_eq(cs_agg.mul(s, 1) + (bh - bh % 1009), pub_in)
        pk6, vk6 = outer.setup(cs_agg)
        agg_proof = outer.prove(pk6, cs_agg, r_rand=5, s_rand=9)
        assert outer.verify(vk6, agg_proof, [bh])
        params = replace(params, agg_vk=vk6)
        w.agg_proof = agg_proof
        t("BW6-761 stand-in aggregator proof (real curve, real vk)", t0)
    cs = build_state_transition_circuit(
        params, w, challenge=0x1CEB00DAFF40, blind=7
    )
    t(
        f"circuit-4 FULL build ({N_VOTES}v/64l/census-{CENSUS_LEVELS}/"
        f"blob-{BLOB_BITS}/lookup): {len(cs.constraints):,} constraints, "
        f"{cs.num_variables:,} variables",
        t0,
    )
    from collections import Counter

    tally = Counter(lbl.split("/")[0] for lbl in cs._labels.values())
    unlabeled = len(cs.constraints) - len(cs._labels)
    for scope, cnt in tally.most_common(12):
        print(f"    {scope}: {cnt:,}", flush=True)
    print(f"    (unlabeled incl. lookup finalize): {unlabeled:,}", flush=True)

    ok = cs.check_satisfied()
    t(f"satisfiability: {ok}", t0)
    assert ok, cs.first_unsatisfied()


if __name__ == "__main__":
    main()
