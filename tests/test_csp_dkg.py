"""CSP EdDSA and DKG/threshold decryption."""

import random

from davinci_tpu import dkg
from davinci_tpu.csp import BabyJubJubEdDSA
from davinci_tpu.elgamal import encrypt_with_k
from davinci_tpu.elgamal.bjj import GENERATOR
from davinci_tpu.elgamal.core import baby_step_giant_step


def test_eddsa_sign_verify():
    signer = BabyJubJubEdDSA(b"seed-1")
    msg = 123456789
    sig = signer.sign(msg)
    assert BabyJubJubEdDSA.verify(signer.public, msg, sig)
    assert not BabyJubJubEdDSA.verify(signer.public, msg + 1, sig)
    # deterministic
    assert signer.sign(msg) == sig
    # different seed -> different key
    assert BabyJubJubEdDSA(b"seed-2").public != signer.public


def test_eddsa_iden3_key_parity():
    """Blake-512 key schedule matches go-iden3-crypto babyjub exactly:
    the babyjub_test.go reference private key maps to the published
    public key (the keypair the reference's CSP would derive,
    crypto/csp/eddsa/babyjubjub_eddsa.go via babyjub.PrivateKey)."""
    raw = bytes.fromhex(
        "0001020304050607080900010203040506070809000102030405060708090001"
    )
    signer = BabyJubJubEdDSA(b"", raw_key=raw)
    assert signer.public[0] == int(
        "13277427435165878497778222415993513565335242147425444199013288"
        "855685581939618"
    )
    assert signer.public[1] == int(
        "13622229784656158136036771217484571176836296686641868549125388"
        "198837476602820"
    )
    # blake-512 itself against the official submission vectors
    from davinci_tpu.hash.blake512 import blake512

    assert blake512(b"\x00").hex().startswith("97961587f6d970faba6d2478")
    assert blake512(bytes(144)).hex().startswith("313717d608e9cf758dcb1eb0")
    msg = 1234567890
    sig = signer.sign(msg)
    assert BabyJubJubEdDSA.verify(signer.public, msg, sig)


def test_csp_proof_roundtrip():
    signer = BabyJubJubEdDSA(b"csp-seed")
    proof = signer.generate_proof(process_id=77, address=0xABC, weight=3)
    assert BabyJubJubEdDSA.verify_proof(proof)
    proof["weight"] = 4
    assert not BabyJubJubEdDSA.verify_proof(proof)


def test_dkg_threshold_decrypt():
    r = random.Random(11)
    ids = [1, 2, 3, 4, 5]
    parts, pk = dkg.run_dkg(ids, threshold=3, rng=r)

    msg = 4242
    c1, c2 = encrypt_with_k(pk, msg, r.randrange(1, 2**200))

    # any 3 participants decrypt
    subset = [2, 4, 5]
    partials = {
        i: dkg.partial_decrypt(parts[i].private_share, c1) for i in subset
    }
    M = dkg.combine_partials(partials, c2)
    assert baby_step_giant_step(M, 10**5) == msg

    # 2 participants cannot
    partials2 = {i: partials[i] for i in subset[:2]}
    M2 = dkg.combine_partials(partials2, c2)
    assert M2 != M


def test_dkg_bad_share_rejected():
    r = random.Random(12)
    ids = [1, 2, 3]
    parts = {i: dkg.Participant(i, 2, ids) for i in ids}
    for p in parts.values():
        p.generate_polynomial(r)
        p.compute_shares()
    import pytest

    with pytest.raises(ValueError):
        parts[1].receive_share(2, parts[2].shares_out[1] + 1, parts[2].public_coeffs)


def test_secies_share_transport():
    """SECIES share encryption (reference dkg/secies role): roundtrip,
    wrong-key failure, tamper detection."""
    import random

    from davinci_tpu.dkg import (
        secies_decrypt,
        secies_encrypt,
        secies_keygen,
    )

    rng = random.Random(99)
    priv, pub = secies_keygen(rng)
    share = rng.randrange(1, 2**250)
    ct = secies_encrypt(pub, share, rng)
    assert secies_decrypt(priv, ct) == share

    import pytest as _pytest

    other_priv, _ = secies_keygen(rng)
    with _pytest.raises(ValueError):
        secies_decrypt(other_priv, ct)

    ct.payload = (ct.payload + 1) % (1 << 250)
    with _pytest.raises(ValueError):
        secies_decrypt(priv, ct)
