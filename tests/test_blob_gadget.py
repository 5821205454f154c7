"""In-circuit barycentric blob evaluation (reference
crypto/blobs/evaluation.go:61-147) vs the host oracle, at a CI-scale
domain (identical code; 4096 is a parameter)."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.blob_gadget import barycentric_eval_host, blob_eval
from davinci_tpu.circuits.emulated import EmulatedOps
from davinci_tpu.groth16 import ConstraintSystem

_R = F.BLS12_381_R


def _domain(n):
    # any order-n multiplicative subgroup works for the math
    g = pow(7, (_R - 1) // n, _R)
    out, cur = [], 1
    for _ in range(n):
        out.append(cur)
        cur = cur * g % _R
    return out


def test_blob_eval_matches_host_oracle():
    rng = random.Random(0x4844)
    n = 16
    dom = _domain(n)
    data = [rng.randrange(_R) for _ in range(n)]
    z = rng.randrange(_R)
    y = barycentric_eval_host(dom, data, z)

    cs = ConstraintSystem(F.BN254_R)
    E = EmulatedOps(cs, _R)
    dv = [E.alloc(d) for d in data]
    zv = E.alloc(z)
    yv = E.alloc(y)
    blob_eval(cs, E, dom, dv, zv, yv)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_blob_eval_wrong_y_fails():
    rng = random.Random(0x4845)
    n = 8
    dom = _domain(n)
    data = [rng.randrange(_R) for _ in range(n)]
    z = rng.randrange(_R)
    y = (barycentric_eval_host(dom, data, z) + 1) % _R

    cs = ConstraintSystem(F.BN254_R)
    E = EmulatedOps(cs, _R)
    dv = [E.alloc(d) for d in data]
    with pytest.raises(AssertionError):
        blob_eval(cs, E, dom, dv, E.alloc(z), E.alloc(y))


def test_blob_eval_consistent_with_real_blob_math():
    """Cross-check the host oracle against blobs/kzg.evaluate_barycentric
    on the real 4096 domain (one point)."""
    from davinci_tpu.blobs.kzg import BLOB_CELLS, Blob, _domain as kzg_domain
    from davinci_tpu.blobs.kzg import evaluate_barycentric

    rng = random.Random(0x4846)
    blob = Blob([rng.randrange(_R) for _ in range(BLOB_CELLS)])
    z = rng.randrange(_R)
    got = barycentric_eval_host(kzg_domain(), blob.cells, z)
    want = evaluate_barycentric(blob, z)
    assert got == want
