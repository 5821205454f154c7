"""Circuit 4 (state transition) at CI scale: reduced batch (N=2), full
64-level tree, every native sub-gadget on — config inclusion, transition
chain, re-encryption, tally, per-vote hashes, keccak batch-hash binding
(reference circuits/statetransition/statetransition.go:118-144).  The
emulated BW6 aggregator-proof sub-gadget is exercised separately/gated."""

import random

import pytest

pytestmark = pytest.mark.heavy

from davinci_tpu import spec as protocol
from davinci_tpu.ballotmode import BallotMode
from davinci_tpu.circuits.statetransition import (
    StateTransitionParams,
    StateTransitionWitness,
    build_state_transition_circuit,
)
from davinci_tpu.elgamal import Ballot, generate_key
from davinci_tpu.elgamal.bjj import BJJ
from davinci_tpu.state import State, Vote, ballot_index_key


def _mk_vote(pid, pub, rng, idx, overwrite_of=None):
    choice = [0] * protocol.FIELDS_PER_BALLOT
    choice[idx % 2] = 1
    k_enc = rng.randrange(1, 2**200)
    b = Ballot.encrypt(choice, pub, k_enc)
    k_re = rng.randrange(1, 2**200)
    reenc, _ = b.reencrypt(pub, k_re)
    address = rng.randrange(2**160)
    return (
        Vote(
            address=address,
            ballot_index=ballot_index_key(idx),
            vote_id=protocol.VOTE_ID_MIN + rng.randrange(2**40),
            ballot=b,
            reencrypted_ballot=reenc,
            weight=1,
        ),
        k_re,
    )


CENSUS_LEVELS = 4


@pytest.fixture(scope="module")
def batch_setup():
    rng = random.Random(0xC4)
    pub, priv = generate_key(rng)
    pid = 424242
    bm = BallotMode()
    st = State(pid)
    st.initialize(1, bm.pack(), (pub.x, pub.y))

    votes, ks = [], []
    for i in range(2):
        v, k = _mk_vote(pid, pub, rng, i)
        votes.append(v)
        ks.append(k)

    # census: LeanIMT over the two voters, origin=1 (merkle static)
    from davinci_tpu.census import CensusDB

    cdb = CensusDB()
    cdb.new("c")
    for v in votes:
        cdb.insert("c", v.address, v.weight)
    census_root = cdb.publish("c")
    tree = cdb.by_id["c"].tree
    cproofs = []
    for i, v in enumerate(votes):
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

    batch = st.prepare_votes_batch(votes)
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
    )
    params = StateTransitionParams(
        n_votes=2, n_levels=64, census_levels=CENSUS_LEVELS
    )
    return params, w


def test_state_transition_satisfiable(batch_setup):
    params, w = batch_setup
    cs = build_state_transition_circuit(params, w)
    assert cs.num_public == 4
    assert cs.public_values() == [
        w.batch.root_before,
        w.batch.root_after,
        w.batch_hash(params),
        w.census_root,
    ]
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_state_transition_wrong_root_after(batch_setup):
    params, w = batch_setup
    cs = build_state_transition_circuit(params, w)
    # tamper the public root_after
    cs.values[2] = (cs.values[2] + 1) % cs.p
    assert not cs.check_satisfied()


def test_state_transition_tampered_reencryption(batch_setup):
    """Claiming a different re-encryption randomness must break."""
    params, w = batch_setup
    cs = build_state_transition_circuit(params, w)
    idx = cs.values.index(w.reenc_k[0], 1)
    cs.values[idx] = (cs.values[idx] + 1) % cs.p
    assert not cs.check_satisfied()


def test_state_transition_tampered_vote_hash(batch_setup):
    """Changing an inputs-hash witness breaks the batch-hash binding."""
    params, w = batch_setup
    cs = build_state_transition_circuit(params, w)
    idx = cs.values.index(w.inputs_hashes[1], 1)
    cs.values[idx] = (cs.values[idx] + 1) % cs.p
    assert not cs.check_satisfied()


def test_state_transition_census_non_member(batch_setup):
    """A voter whose census proof points at another leaf must break
    (VerifyMerkleCensusProofs role: leaf binds address+weight)."""
    import copy

    params, w = batch_setup
    w2 = copy.copy(w)
    w2.census_proofs = copy.deepcopy(w.census_proofs)
    # swap vote 0's census path for vote 1's (valid path, wrong leaf)
    w2.census_proofs[0] = copy.deepcopy(w.census_proofs[1])
    cs = build_state_transition_circuit(params, w2)
    assert not cs.check_satisfied()


def test_state_transition_census_wrong_root(batch_setup):
    """Census proofs against a different published root must break."""
    import copy

    params, w = batch_setup
    w2 = copy.copy(w)
    w2.census_root = (w.census_root + 1) % (1 << 250)
    cs = build_state_transition_circuit(params, w2)
    assert not cs.check_satisfied()


def test_state_transition_csp_census():
    """CSP-origin process: EdDSA certificate checks replace the Merkle
    branch (VerifyCSPCensusProofs role)."""
    from davinci_tpu import spec as protocol_spec
    from davinci_tpu.csp import BabyJubJubEdDSA, csp_circuit_proof

    rng = random.Random(0xC5)
    pub, _priv = generate_key(rng)
    pid = 515151
    bm = BallotMode()
    csp = BabyJubJubEdDSA(b"csp-test-seed")
    origin = protocol_spec.CENSUS_ORIGIN_CSP_EDDSA_BJJ
    st = State(pid)
    st.initialize(origin, bm.pack(), (pub.x, pub.y))

    votes, ks, cproofs = [], [], []
    for i in range(2):
        v, k = _mk_vote(pid, pub, rng, i)
        votes.append(v)
        ks.append(k)
        wire = csp.generate_proof(pid, v.address, v.weight, voter_index=i)
        cproofs.append(csp_circuit_proof(wire))
    batch = st.prepare_votes_batch(votes)
    w = StateTransitionWitness(
        batch=batch,
        process_id=pid,
        ballot_mode_packed=bm.pack(),
        encryption_key=(pub.x, pub.y),
        census_origin=origin,
        reenc_k=ks,
        inputs_hashes=[rng.randrange(1 << 250) for _ in votes],
        census_root=csp.census_root(),
        census_proofs=cproofs,
    )
    params = StateTransitionParams(
        n_votes=2, n_levels=64, census_levels=CENSUS_LEVELS
    )
    cs = build_state_transition_circuit(params, w)
    assert cs.check_satisfied(), cs.first_unsatisfied()

    # forged signature s must break the group equation
    cs2 = build_state_transition_circuit(params, w)
    idx = cs2.values.index(cproofs[0]["s"], 1)
    cs2.values[idx] = (cs2.values[idx] + 1) % cs2.p
    assert not cs2.check_satisfied()


def test_state_transition_blob_binding(batch_setup):
    """include_blob: the packed batch cells, bound from the in-circuit vote
    variables, must barycentric-evaluate to y at z over emulated BLS12-381
    Fr (reference VerifyBlobs:400).  Reduced 128-cell domain, lookup tier."""
    import copy
    import random as _r
    from dataclasses import replace

    from davinci_tpu import fields as F
    from davinci_tpu.circuits.blob_gadget import barycentric_eval_host
    from davinci_tpu.circuits.statetransition import _blob_domain

    params, w = batch_setup
    p2 = replace(params, include_blob=True, blob_domain_bits=7, use_lookup=True)
    # the cells exactly as state/blobcodec.pack_batch_blob lays them out
    cells = list(w.batch.new_results.coords()) + [len(w.batch.votes)]
    for v in w.batch.votes:
        cells += [v.vote_id, v.address, v.ballot_index, v.weight]
        cells += v.reencrypted_ballot.coords()
    dom = _blob_domain(7)
    data = cells + [0] * (len(dom) - len(cells))
    rng = _r.Random(9)
    z = rng.randrange(F.BLS12_381_R)
    y = barycentric_eval_host(dom, data, z)
    w2 = copy.copy(w)
    w2.blob_z, w2.blob_y = z, y
    cs = build_state_transition_circuit(p2, w2, challenge=0x1CEB00DA999, blind=3)
    assert cs.public_values()[-4:] == [
        z & ((1 << 128) - 1), z >> 128,
        y & ((1 << 128) - 1), y >> 128,
    ]
    assert cs.check_satisfied(), cs.first_unsatisfied()

    w3 = copy.copy(w2)
    w3.blob_y = (y + 1) % F.BLS12_381_R
    try:
        cs = build_state_transition_circuit(
            p2, w3, challenge=0x1CEB00DA999, blind=3
        )
        ok = cs.check_satisfied()
    except AssertionError:  # hint-time detection during the build
        ok = False
    assert not ok


def test_state_transition_verify_aggregator(batch_setup):
    """The PRODUCTION configuration's soundness core: the aggregator proof
    verified in-circuit (reference statetransition.go:240
    VerifyAggregatorProof) — full Miller loop + final exp over the toy
    2-chain outer curve (identical gadget code to BW6-761), lookup tier.
    The aggregator's single public input IS the batch hash."""
    import copy
    from dataclasses import replace

    from davinci_tpu.circuits.toycurve import toy_2chain, toy_2chain_groth16
    from davinci_tpu.groth16 import ConstraintSystem as CS

    t = toy_2chain()
    _, outer = toy_2chain_groth16()
    r6 = t["ctx6"].r
    params, w = batch_setup
    # hash_bytes must leave the batch hash inside the outer scalar field
    # (production: 31 bytes < BW6-761 r = BLS12-377 p; toy r is ~139 bits)
    hb = (r6.bit_length() - 1) // 8
    p2 = replace(
        params, hash_bytes=hb, use_lookup=True,
        verify_aggregator=True, agg_ctx=t["ctx6"],
    )
    bh = w.batch_hash(p2)

    # stand-in aggregator circuit over the toy outer curve: one public
    # input (the batch hash), arbitrary internal logic
    cs_agg = CS(r6)
    pub = cs_agg.pub_input(bh)
    s = cs_agg.priv_input(bh % 1009)
    cs_agg.assert_eq(cs_agg.mul(s, 1) + (bh - bh % 1009), pub)
    pk, vk = outer.setup(cs_agg)
    agg_proof = outer.prove(pk, cs_agg, r_rand=5, s_rand=9)
    assert outer.verify(vk, agg_proof, [bh])

    p2 = replace(p2, agg_vk=vk)
    w2 = copy.copy(w)
    w2.agg_proof = agg_proof
    cs = build_state_transition_circuit(p2, w2, challenge=0x1CEB00DA777, blind=5)
    assert cs.check_satisfied(), cs.first_unsatisfied()

    # a proof for a DIFFERENT batch hash must break
    cs_agg2 = CS(r6)
    bh2 = (bh + 1) % r6
    pub = cs_agg2.pub_input(bh2)
    s = cs_agg2.priv_input(bh2 % 1009)
    cs_agg2.assert_eq(cs_agg2.mul(s, 1) + (bh2 - bh2 % 1009), pub)
    wrong = outer.prove(pk, cs_agg2, r_rand=5, s_rand=9)
    w3 = copy.copy(w)
    w3.agg_proof = wrong
    try:
        cs2 = build_state_transition_circuit(
            p2, w3, challenge=0x1CEB00DA777, blind=5
        )
        ok = cs2.check_satisfied()
    except AssertionError:  # residue-witness hint detects the mismatch
        ok = False
    assert not ok


@pytest.mark.skipif(
    "not __import__('os').environ.get('RUN_HEAVY_CIRCUITS')",
    reason="production BW6-761 aggregator-verify build is heavy",
)
def test_state_transition_verify_aggregator_bw6_production(batch_setup):
    """The PRODUCTION instantiation of the aggregator-verify sub-gadget:
    emulated REAL BW6-761 (761-bit base field) Groth16 verification
    inside the BN254 state-transition circuit (reference
    statetransition.go:240 VerifyAggregatorProof over gnark sw_bw6761).
    Prints the constraint count — the number that sizes full-scale c4."""
    import copy
    import os
    from dataclasses import replace

    import jax

    if not os.environ.get("RUN_TPU_TESTS"):
        jax.config.update("jax_platforms", "cpu")

    from davinci_tpu.groth16 import ConstraintSystem as CS
    from davinci_tpu.groth16 import Groth16
    from davinci_tpu.pairing import PAIRINGS

    ctx6 = PAIRINGS["bw6_761"]
    outer = Groth16("bw6_761")
    params, w = batch_setup
    p2 = replace(
        params, hash_bytes=31, use_lookup=True,
        verify_aggregator=True, agg_ctx=ctx6,
    )
    bh = w.batch_hash(p2)

    # stand-in aggregator circuit over BW6-761: one public input (the
    # batch hash), arbitrary internal logic — the gadget cost depends
    # only on the VK shape, not the inner circuit size
    cs_agg = CS(ctx6.r)
    pub = cs_agg.pub_input(bh)
    s = cs_agg.priv_input(bh % 1009)
    cs_agg.assert_eq(cs_agg.mul(s, 1) + (bh - bh % 1009), pub)
    pk, vk = outer.setup(cs_agg)
    agg_proof = outer.prove(pk, cs_agg, r_rand=5, s_rand=9)
    assert outer.verify(vk, agg_proof, [bh])

    p2 = replace(p2, agg_vk=vk)
    w2 = copy.copy(w)
    w2.agg_proof = agg_proof
    cs = build_state_transition_circuit(
        p2, w2, challenge=0x1CEB00DA777, blind=5
    )
    print(
        f"\nc4 + PRODUCTION BW6-761 aggregator-verify (N=2): "
        f"{len(cs.constraints):,} constraints, "
        f"{cs.num_variables:,} variables"
    )
    assert cs.check_satisfied(), cs.first_unsatisfied()
