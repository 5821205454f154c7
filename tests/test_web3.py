"""web3 layer: RLP/ABI vectors, blob tx signing/recovery, TxManager
escalation against a fake RPC, pool failover."""

import time

import pytest

from davinci_tpu import ethereum as eth
from davinci_tpu.web3 import abi_encode, function_selector, rlp_encode
from davinci_tpu.web3.blobtx import build_blob_tx, sender_of, sign_blob_tx
from davinci_tpu.web3.encoding import encode_call
from davinci_tpu.web3.rpc import Web3Pool
from davinci_tpu.web3.txmanager import MAX_FEE_CAP, TxManager


def test_rlp_vectors():
    # canonical RLP vectors
    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(b"\x00") == b"\x00"
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([]) == b"\xc0"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(15) == b"\x0f"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    long = b"a" * 56
    assert rlp_encode(long) == b"\xb8\x38" + long


def test_function_selector():
    # the canonical example
    assert function_selector("transfer(address,uint256)").hex() == "a9059cbb"
    assert function_selector("baz(uint32,bool)").hex() == "cdcd77c0"


def test_abi_encoding():
    # baz(69, true) from the Solidity ABI spec
    out = abi_encode(["uint32", "bool"], [69, True])
    assert out.hex() == (
        "0000000000000000000000000000000000000000000000000000000000000045"
        "0000000000000000000000000000000000000000000000000000000000000001"
    )
    # dynamic bytes
    out = abi_encode(["bytes"], [b"abc"])
    assert out[:32] == (32).to_bytes(32, "big")
    assert out[32:64] == (3).to_bytes(32, "big")
    assert out[64:67] == b"abc"
    # uint256[] array
    out = abi_encode(["uint256[]"], [[1, 2]])
    assert len(out) == 32 + 32 + 64
    # call with tuple
    data = encode_call(
        "submit((uint256,uint256),bytes32)",
        [["uint256", "uint256"], "bytes32"],
        [(1, 2), b"\x11" * 32],
    )
    assert len(data) == 4 + 3 * 32


def test_blob_tx_sign_and_recover():
    priv = 0xA11CE
    addr = eth.address_from_pubkey(eth.pubkey_from_priv(priv))
    blob = b"\x00" * 131072
    com = b"\x01" * 48
    proof = b"\x02" * 48
    tx = build_blob_tx(
        chain_id=1,
        nonce=7,
        to=b"\x22" * 20,
        data=b"\xde\xad",
        blobs_with_kzg=[(blob, com, proof)],
    )
    sign_blob_tx(tx, priv)
    assert sender_of(tx) == addr
    raw = tx.encode_signed()
    assert raw[0] == 3  # type-3
    assert len(tx.blob_versioned_hashes) == 1
    assert tx.blob_versioned_hashes[0][0] == 1


class FakeRPC:
    def __init__(self):
        self.sent = []
        self.confirm_after = 2  # confirm on nth receipt poll
        self.polls = {}

    def nonce(self, addr):
        return 5

    def send_raw(self, raw):
        h = "0x" + eth.keccak256(raw).hex()
        self.sent.append((h, raw))
        return h

    def receipt(self, tx_hash):
        # global poll counter: rebroadcasts change the hash, but the fake
        # chain confirms once enough polls have happened overall
        self.total_polls = getattr(self, "total_polls", 0) + 1
        if self.total_polls >= self.confirm_after:
            return {"status": "0x1"}
        return None


def test_txmanager_escalation():
    rpc = FakeRPC()
    fees = []
    tm = TxManager(rpc, "0xsender", retry_after=0.0)  # escalate every tick

    confirmed = []
    tm.submit(
        "t1",
        build=lambda nonce, fee: fees.append(fee) or fee.to_bytes(16, "big"),
        on_confirmed=lambda rec: confirmed.append(rec),
        on_failed=lambda e: pytest.fail(f"should not fail: {e}"),
        max_fee=10**9,
    )
    rpc.confirm_after = 3
    tm.tick()  # no receipt yet -> escalate (+50%)
    tm.tick()
    assert confirmed or fees[-1] > fees[0]
    while not confirmed:
        tm.tick()
    assert fees[1] == fees[0] * 3 // 2


def test_txmanager_fee_cap_and_failure():
    rpc = FakeRPC()
    rpc.confirm_after = 10**9  # never confirms
    failed = []
    tm = TxManager(rpc, "0xsender", retry_after=0.0)
    tm.submit(
        "t2",
        build=lambda nonce, fee: fee.to_bytes(16, "big"),
        on_confirmed=lambda rec: pytest.fail("should not confirm"),
        on_failed=lambda e: failed.append(e),
        max_fee=200 * 10**9,
    )
    for _ in range(20):
        tm.tick()
    assert failed == ["max retries exceeded"]


def test_pool_failover():
    class Bad:
        def call(self, m, p):
            raise RuntimeError("down")

    class Good:
        def call(self, m, p):
            return "0x1"

    pool = Web3Pool([Bad(), Good()], cooldown=60)
    assert pool.call("eth_chainId", []) == "0x1"
    # bad endpoint now demoted: next call goes straight to good
    assert pool.call("eth_chainId", []) == "0x1"


def test_groth16_proof_calldata():
    """Proof tuple flattening for the on-chain verifiers (reference
    solidity/solidity.go:15-116): G2 words swap to (imag, real), the
    commitment extension appends D + PoK."""
    from types import SimpleNamespace as NS

    from davinci_tpu.web3.encoding import (
        encode_proof_calldata,
        groth16_commitment_proof_tuple,
        groth16_proof_tuple,
    )

    def pt(x, y):
        return NS(x=NS(v=x), y=NS(v=y))

    proof = NS(
        a=pt(1, 2), b=pt((3, 4), (5, 6)), c=pt(7, 8), d=None, pok=None
    )
    words = groth16_proof_tuple(proof)
    assert words == [1, 2, 4, 3, 6, 5, 7, 8]

    cproof = NS(
        a=pt(1, 2), b=pt((3, 4), (5, 6)), c=pt(7, 8),
        d=pt(9, 10), pok=pt(11, 12),
    )
    cwords = groth16_commitment_proof_tuple(cproof)
    assert cwords == words + [9, 10, 11, 12]

    data = encode_proof_calldata(cproof, [99, 100])
    # static tuple: 12 proof words + 2 publics, no offsets
    assert len(data) == (12 + 2) * 32
    assert int.from_bytes(data[-32:], "big") == 100
    data2 = encode_proof_calldata(proof, [99])
    assert len(data2) == (8 + 1) * 32


def test_blob_tx_sidecar_v1_cell_proofs():
    """Version-1 (EIP-7594) sidecar: 128 cell proofs per blob, version byte
    in the network encoding (reference types/blobs.go:90-162)."""
    from davinci_tpu.web3.blobtx import CELL_PROOFS_PER_BLOB

    priv = 0xB0B
    blob = b"\x00" * 131072
    com = b"\x01" * 48
    cells = [bytes([i % 256]) * 48 for i in range(CELL_PROOFS_PER_BLOB)]
    tx = build_blob_tx(
        chain_id=1,
        nonce=1,
        to=b"\x22" * 20,
        data=b"",
        blobs_with_kzg=[(blob, com, cells)],
        sidecar_version=1,
    )
    sign_blob_tx(tx, priv)
    assert len(tx.proofs) == CELL_PROOFS_PER_BLOB
    net = tx.encode_network()
    assert net[0] == 3 and net[1] == 1  # tx type, sidecar version
    # wrong proof count fails the structural guard
    tx.proofs = tx.proofs[:-1]
    with pytest.raises(ValueError):
        tx.validate_sidecar()
    # version 0 with one blob proof is still fine
    tx0 = build_blob_tx(
        chain_id=1, nonce=1, to=b"\x22" * 20, data=b"",
        blobs_with_kzg=[(blob, com, b"\x02" * 48)],
    )
    sign_blob_tx(tx0, priv)
    assert tx0.encode_network()[0] == 3
    tx0.validate_sidecar()
