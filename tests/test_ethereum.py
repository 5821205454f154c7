"""Keccak + secp256k1 ECDSA: public vectors, sign/verify/recover round trips."""

import random

from davinci_tpu import ethereum as E


def test_keccak_vectors():
    assert (
        E.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        E.keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert (
        E.keccak256(b"hello").hex()
        == "1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8"
    )
    # multi-block message (>136 bytes)
    long = b"x" * 300
    assert len(E.keccak256(long)) == 32


def test_sign_verify_recover():
    r = random.Random(5)
    priv = r.randrange(1, E.N)
    pub = E.pubkey_from_priv(priv)
    addr = E.address_from_pubkey(pub)
    assert len(addr) == 20
    msg = bytes(range(32))
    rr, ss, rec = E.sign_eth_prefixed(priv, msg)
    assert ss <= E.N // 2  # low-s
    assert E.verify_eth_prefixed(pub, msg, rr, ss)
    assert not E.verify_eth_prefixed(pub, bytes(32), rr, ss)
    assert E.recover_address(msg, rr, ss, rec) == addr


def test_deterministic_signature():
    priv = 0xDEADBEEF
    msg = b"\x11" * 32
    assert E.sign_eth_prefixed(priv, msg) == E.sign_eth_prefixed(priv, msg)
