"""EIP-7594 cell proofs: extension consistency, proof verification via
pairing, tamper rejection (reference types/blobs.go:90-162 cell-proof
sidecar).  CI verifies a subset of cells; all 128 is a size parameter."""

import random

import pytest

pytestmark = pytest.mark.heavy  # CPU-backend MSMs dominate

from davinci_tpu import fields as F
from davinci_tpu.blobs.cells import (
    BLOB_CELLS,
    CELLS_PER_BLOB,
    FIELD_ELEMENTS_PER_CELL,
    blob_to_coeffs,
    compute_cells,
    compute_cells_and_proofs,
    verify_cell_proof,
)
from davinci_tpu.blobs.kzg import Blob, blob_to_commitment


@pytest.fixture(scope="module")
def blob():
    rng = random.Random(0x7594)
    return Blob([rng.randrange(F.BLS12_381_R) for _ in range(BLOB_CELLS)])


def test_cells_extend_blob(blob):
    """The first half of the extended cells reproduces the blob data
    (systematic Reed-Solomon in brp layout)."""
    cells = compute_cells(blob)
    assert len(cells) == CELLS_PER_BLOB
    flat = [x for cell in cells[: CELLS_PER_BLOB // 2] for x in cell]
    assert flat == blob.cells


def test_coeffs_roundtrip(blob):
    coeffs = blob_to_coeffs(blob)
    assert len(coeffs) == BLOB_CELLS
    # spot-evaluate: p(domain_brp[i]) == blob.cells[i]
    from davinci_tpu.blobs.kzg import _domain

    dom = _domain()
    for i in (0, 1, 777):
        x = dom[i]
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % F.BLS12_381_R
        assert acc == blob.cells[i]


def test_cell_proofs_verify_and_reject(blob):
    commitment = blob_to_commitment(blob)
    ids = [0, 127]
    cells, proofs = compute_cells_and_proofs(blob, ids)
    for cid, cell, proof in zip(ids, cells, proofs):
        assert len(cell) == FIELD_ELEMENTS_PER_CELL
        assert verify_cell_proof(commitment, cid, cell, proof)
    # tamper: cell 0's proof against cell 127's data/id must fail
    assert not verify_cell_proof(commitment, 127, cells[1], proofs[0])


def test_device_cell_proofs_match_host(blob):
    """The batched device pipeline (device iNTT -> quotient scan -> NTT ->
    msm_many) produces byte-identical proofs to the host per-cell path."""
    from davinci_tpu.blobs.cells import (
        compute_cell_proof,
        compute_cell_proofs_device,
    )

    ids = [3, 64]
    dev = compute_cell_proofs_device(blob, ids)
    for cid, proof in zip(ids, dev):
        assert proof == compute_cell_proof(blob, cid)
