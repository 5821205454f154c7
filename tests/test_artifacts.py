"""Artifact store: serialize roundtrips, load-or-setup-once semantics,
structure-hash pinning (reference circuits/artifacts.go:62-571 roles)."""

import json

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.groth16 import ConstraintSystem, Groth16
from davinci_tpu.groth16.serialize import (
    cs_structure_hash,
    pk_from_bytes,
    pk_to_bytes,
    proof_from_dict,
    proof_to_dict,
    vk_from_bytes,
    vk_to_bytes,
)


def _cubic(x_val, y_pub):
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(y_pub)
    x = cs.priv_input(x_val)
    x3 = cs.mul(cs.mul(x, x), x)
    cs.assert_eq(x3 + x + 5, y)
    return cs


def test_key_serialize_roundtrip():
    g16 = Groth16("bn254")
    cs = _cubic(3, 35)
    pk, vk = g16.setup(cs)

    pk2 = pk_from_bytes(pk_to_bytes(pk, g16.g1, g16.g2), g16.g1, g16.g2)
    vk2 = vk_from_bytes(vk_to_bytes(vk, g16.g1, g16.g2), g16.g1, g16.g2)

    assert pk2.alpha_g1 == pk.alpha_g1
    assert pk2.beta_g2 == pk.beta_g2  # G2 (Fp2 coords)
    assert pk2.domain_log == pk.domain_log
    assert pk2.a_g1 == pk.a_g1
    assert pk2.b_g2 == pk.b_g2
    assert vk2.k_pub_g1 == vk.k_pub_g1

    # keys reloaded from bytes must still prove/verify
    proof = g16.prove(pk2, cs, r_rand=5, s_rand=9)
    assert g16.verify(vk2, proof, [35])

    # proof dict codec roundtrip
    d = proof_to_dict(proof)
    json.dumps(d)  # JSON-safe
    p2 = proof_from_dict(d, g16.g1, g16.g2)
    assert (p2.a, p2.b, p2.c) == (proof.a, proof.b, proof.c)


def test_load_or_setup_once(tmp_path):
    store = ArtifactStore(tmp_path)
    cs = _cubic(3, 35)
    rt1 = store.load_or_setup("cubic-test", "bn254", cs)
    meta = json.loads((tmp_path / "cubic-test" / "meta.json").read_text())
    assert meta["structure_hash"] == cs_structure_hash(cs)

    # a fresh store (fresh process role) loads from disk — same keys
    store2 = ArtifactStore(tmp_path)
    cs2 = _cubic(4, 4**3 + 4 + 5)  # different witness, same structure
    rt2 = store2.load_or_setup("cubic-test", "bn254", cs2)
    assert rt2.vk.alpha_g1 == rt1.vk.alpha_g1
    proof = rt2.prove_and_verify(cs2, r_rand=1, s_rand=2)
    assert rt1.verify(proof, [4**3 + 4 + 5])


def test_structure_hash_pins_circuit(tmp_path):
    store = ArtifactStore(tmp_path)
    store.load_or_setup("pinned", "bn254", _cubic(3, 35))

    # same id, different structure -> in-memory cache refuses
    cs_other = ConstraintSystem(F.BN254_R)
    y = cs_other.pub_input(9)
    x = cs_other.priv_input(3)
    cs_other.assert_eq(cs_other.mul(x, x), y)
    with pytest.raises(ValueError):
        store.load_or_setup("pinned", "bn254", cs_other)

    # witness-only changes hash identically
    assert cs_structure_hash(_cubic(3, 35)) == cs_structure_hash(_cubic(7, 355))
    assert cs_structure_hash(_cubic(3, 35)) != cs_structure_hash(cs_other)
