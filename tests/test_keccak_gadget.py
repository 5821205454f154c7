"""In-circuit Keccak-256 vs the host keccak oracle (reference gnark
std/hash/sha3 role in the vote verifier)."""

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.keccak_gadget import (
    bits_to_int_value,
    bytes_to_bits,
    keccak256_bits,
)
from davinci_tpu.ethereum import keccak256
from davinci_tpu.groth16 import ConstraintSystem


@pytest.mark.parametrize(
    "msg", [b"", b"abc", b"davinci", bytes(range(150))]
)
def test_keccak_constant_folding_matches(msg):
    """Constant inputs fold completely (0 constraints) and match."""
    cs = ConstraintSystem(F.BLS12_377_R)
    out = keccak256_bits(cs, bytes_to_bits(cs, msg))
    assert bits_to_int_value(out) == int.from_bytes(keccak256(msg), "big")
    assert len(cs.constraints) == 0


def _witness_bits(cs, msg: bytes):
    bits = []
    for byte in msg:
        for i in range(8):
            b = cs.priv_input((byte >> i) & 1)
            cs.assert_bool(b)
            bits.append(b)
    return bits


def test_keccak_witness_input():
    """Witness inputs generate the real boolean circuit; result matches the
    host oracle and the system is satisfiable."""
    msg = b"davinci witness input 32bytes!!!"
    cs = ConstraintSystem(F.BLS12_377_R)
    out = keccak256_bits(cs, _witness_bits(cs, msg))
    assert bits_to_int_value(out) == int.from_bytes(keccak256(msg), "big")
    n = len(cs.constraints)
    assert 80_000 < n < 250_000, n  # one permutation's worth
    assert cs.check_satisfied()


def test_keccak_witness_tamper_breaks():
    msg = b"tamper-me"
    cs = ConstraintSystem(F.BLS12_377_R)
    bits = _witness_bits(cs, msg)
    keccak256_bits(cs, bits)
    assert cs.check_satisfied()
    idx = next(iter(bits[3].terms))
    cs.values[idx] ^= 1
    assert not cs.check_satisfied()
