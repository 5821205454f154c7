"""Circuit 2 (vote verifier) at CI scale: the full statement — inner
Groth16 verification (emulated pairing), ECDSA over the EIP-191 voteID
message, keccak address binding, public vote-hash — composed on the toy
curves.  Identical code path to the production BN254+secp256k1 build
(reference circuits/voteverifier/vote_verifier.go:71-110)."""

import random

import pytest

pytestmark = pytest.mark.heavy

from davinci_tpu import spec as protocol
from davinci_tpu.circuits.toycurve import toy_bls12, toy_groth16
from davinci_tpu.circuits.voteverifier import (
    VoteVerifierParams,
    build_vote_verifier_circuit,
    make_vote_verifier_witness,
)
from davinci_tpu.groth16 import ConstraintSystem


@pytest.fixture(scope="module")
def toy_c2():
    """Inner toy 'ballot proof' (1 public = inputs hash) + circuit-2 build."""
    t = toy_bls12()
    g16 = toy_groth16()
    rng = random.Random(97)

    x_v = rng.randrange(2, t["r"])
    ih = x_v * x_v % t["r"]  # stand-in ballot-inputs hash
    cs_in = ConstraintSystem(t["r"])
    h = cs_in.pub_input(ih)
    x = cs_in.priv_input(x_v)
    cs_in.assert_eq(cs_in.mul(x, x), h)
    pk, vk = g16.setup(cs_in)
    inner_proof = g16.prove(pk, cs_in, r_rand=3, s_rand=5)
    assert g16.verify(vk, inner_proof, [ih])

    params = VoteVerifierParams(
        inner_ctx=t["ctx"],
        inner_vk=vk,
        sig_spec=t["g1"],
        sig_coord_bits=96,  # toy p is 85 bits -> 12-byte coords
    )
    priv_key = rng.randrange(1, t["g1"].r)
    vote_id = protocol.VOTE_ID_MIN + rng.randrange(1 << 40)
    w = make_vote_verifier_witness(
        params,
        process_id=12345,
        priv_sig_key=priv_key,
        inputs_hash=ih,
        ballot_proof=inner_proof,
        vote_id=vote_id,
    )
    cs = build_vote_verifier_circuit(params, w)
    return params, w, cs


def test_vote_verifier_satisfiable(toy_c2):
    params, w, cs = toy_c2
    assert cs.num_public == 1
    assert cs.public_values() == [w.vote_hash(params.hash_p)]
    assert cs.check_satisfied()


def test_vote_verifier_tamper_address_unsat(toy_c2):
    params, w, cs = toy_c2
    # the address witness variable is the 3rd allocation (pid, addr, ...)
    # find it by value instead of position for robustness
    idx = cs.values.index(w.address, 1)
    cs.values[idx] = (w.address + 1) % cs.p
    assert not cs.check_satisfied()
    cs.values[idx] = w.address
    assert cs.check_satisfied()


def test_vote_verifier_wrong_signer_fails(toy_c2):
    """A witness signed by a different key than the claimed address: the
    build itself fails (address binding) or verification is unsat."""
    params, w, cs = toy_c2
    t = toy_bls12()
    rng = random.Random(101)
    other_priv = rng.randrange(1, t["g1"].r)
    w2 = make_vote_verifier_witness(
        params,
        process_id=w.process_id,
        priv_sig_key=other_priv,
        inputs_hash=w.inputs_hash,
        ballot_proof=w.ballot_proof,
        vote_id=w.vote_id,
    )
    w2.address = w.address  # claim the original address
    cs2 = build_vote_verifier_circuit(params, w2)
    assert not cs2.check_satisfied()


def test_vote_verifier_lookup_tier(toy_c2):
    """The same circuit-2 statement with lookup range checks: identical
    semantics, collapsed constraint count (the committed-proving tier)."""
    params, w, cs_bits = toy_c2
    from dataclasses import replace

    p2 = replace(params, use_lookup=True)
    cs = build_vote_verifier_circuit(p2, w, challenge=0x1CEB00DA999, blind=5)
    assert cs.public_values() == [w.vote_hash(p2.hash_p)]
    assert cs.check_satisfied(), cs.first_unsatisfied()
    n_bits, n_lk = len(cs_bits.constraints), len(cs.constraints)
    assert n_lk < 0.55 * n_bits, (n_lk, n_bits)
