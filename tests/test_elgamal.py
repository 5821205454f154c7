"""ElGamal on BabyJubJub (RTE): roundtrips, homomorphism, ballots, proofs."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu import spec
from davinci_tpu.elgamal import (
    Ballot,
    build_decryption_proof,
    decrypt,
    encrypt_with_k,
    generate_key,
    verify_decryption_proof,
)
from davinci_tpu.elgamal.bjj import (
    BJJ,
    GENERATOR,
    ORDER,
    rte_to_te,
    te_to_rte,
)
from davinci_tpu.curves import babyjubjub as bjj_te


def test_rte_te_conversion_consistency():
    # adding in RTE == adding in TE then converting
    r = random.Random(1)
    k1, k2 = r.randrange(1, ORDER), r.randrange(1, ORDER)
    p_rte = GENERATOR.mul(k1)
    q_rte = GENERATOR.mul(k2)
    s_rte = p_rte.add(q_rte)
    p_te = bjj_te.mul(bjj_te.base8, k1)
    q_te = bjj_te.mul(bjj_te.base8, k2)
    s_te = bjj_te.add(p_te, q_te)
    assert rte_to_te(s_rte.coords()) == s_te
    assert te_to_rte(s_te) == s_rte.coords()


def test_encrypt_decrypt_roundtrip():
    r = random.Random(2)
    pub, priv = generate_key(r)
    msg = 123456
    c1, c2 = encrypt_with_k(pub, msg, r.randrange(1, ORDER))
    _, got = decrypt(pub, priv, c1, c2, 10**6)
    assert got == msg


def test_homomorphic_add():
    r = random.Random(3)
    pub, priv = generate_key(r)
    c1a, c2a = encrypt_with_k(pub, 100, r.randrange(1, ORDER))
    c1b, c2b = encrypt_with_k(pub, 250, r.randrange(1, ORDER))
    _, got = decrypt(pub, priv, c1a.add(c1b), c2a.add(c2b), 1000)
    assert got == 350


def test_ballot_encrypt_add_reencrypt():
    r = random.Random(4)
    pub, priv = generate_key(r)
    msgs1 = [1, 2, 3, 4, 0, 0, 1, 5]
    msgs2 = [2, 0, 1, 1, 1, 0, 0, 3]
    b1 = Ballot.encrypt(msgs1, pub, k=777)
    b2 = Ballot.encrypt(msgs2, pub, k=888)
    summed = b1.add(b2)
    for i, (c1, c2) in enumerate(summed.ciphertexts):
        _, got = decrypt(pub, priv, c1, c2, 100)
        assert got == msgs1[i] + msgs2[i]

    # re-encryption preserves plaintexts and changes ciphertexts
    b3, _ = b1.reencrypt(pub, k=999)
    assert b3.ciphertexts[0] != b1.ciphertexts[0]
    for i, (c1, c2) in enumerate(b3.ciphertexts):
        _, got = decrypt(pub, priv, c1, c2, 100)
        assert got == msgs1[i]


def test_zero_ballot_hash_is_spec_constant():
    assert Ballot.zero().hash() == spec.ZERO_BALLOT_HASH


def test_decryption_proof():
    r = random.Random(5)
    pub, priv = generate_key(r)
    msg = 4242
    c1, c2 = encrypt_with_k(pub, msg, r.randrange(1, ORDER))
    proof = build_decryption_proof(priv, pub, c1, c2, msg, r)
    assert verify_decryption_proof(pub, c1, c2, msg, proof)
    assert not verify_decryption_proof(pub, c1, c2, msg + 1, proof)


def test_vote_id():
    vid = spec.vote_id(123, 456, 789)
    assert spec.VOTE_ID_MIN <= vid <= spec.VOTE_ID_MAX


def test_state_root_runs():
    root = spec.state_root(1, 2, 3, 4, 5)
    assert 0 < root < F.BN254_R
