"""EIP-4844 KZG: setup loads, commitment/proof verify against the real
ceremony SRS via pairings, barycentric = claimed evaluation."""

import random

import pytest

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.blobs import (
    Blob,
    blob_to_commitment,
    compute_evaluation_point,
    compute_kzg_proof,
    evaluate_barycentric,
    verify_kzg_proof,
    versioned_hash,
)
from davinci_tpu.blobs.setup import load_trusted_setup


@pytest.fixture(scope="module")
def setup():
    return load_trusted_setup()


def test_setup_loads_and_points_valid(setup):
    g1, g2 = setup
    assert len(g1) == 4096 and len(g2) == 65
    for p in g1[:4] + g2[:3]:
        assert p.is_on_curve()
    # G2[0] must be the canonical generator's subgroup: order check
    assert g2[0].mul(F.BLS12_381_R).infinity


def _small_blob(r):
    # sparse blob: only first cells set (fast barycentric oracle still runs
    # over all 4096)
    cells = [r.randrange(F.BLS12_381_R) for _ in range(5)]
    return Blob(cells)


@pytest.mark.heavy  # host pairing checks: minutes each
def test_commit_prove_verify(setup):
    r = random.Random(1)
    blob = _small_blob(r)
    com = blob_to_commitment(blob)
    assert len(com) == 48
    z = r.randrange(F.BLS12_381_R)
    proof, y = compute_kzg_proof(blob, z)
    assert y == evaluate_barycentric(blob, z)
    assert verify_kzg_proof(com, z, y, proof)
    assert not verify_kzg_proof(com, z, (y + 1) % F.BLS12_381_R, proof)


@pytest.mark.heavy  # host pairing checks: minutes each
def test_in_domain_proof(setup):
    from davinci_tpu.blobs.kzg import _domain

    r = random.Random(2)
    blob = _small_blob(r)
    com = blob_to_commitment(blob)
    z = _domain()[3]
    proof, y = compute_kzg_proof(blob, z)
    assert y == blob.cells[3]
    assert verify_kzg_proof(com, z, y, proof)


def test_evaluation_point_and_versioned_hash():
    com = b"\x01" * 48
    z = compute_evaluation_point(123, 456, com)
    assert 0 < z < F.BN254_R
    vh = versioned_hash(com)
    assert vh[0] == 1 and len(vh) == 32


def test_blob_bytes_roundtrip():
    r = random.Random(3)
    blob = _small_blob(r)
    assert Blob.from_bytes(blob.to_bytes()).cells == blob.cells
