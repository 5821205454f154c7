"""Groth16 end-to-end: toy circuits proved on device, verified via pairings."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu.groth16 import ConstraintSystem, Groth16


def _cubic_circuit(x_val, y_pub):
    """Toy: prove knowledge of x with x^3 + x + 5 == y (public y)."""
    cs = ConstraintSystem(F.BN254_R)
    y = cs.pub_input(y_pub)
    x = cs.priv_input(x_val)
    x2 = cs.mul(x, x)
    x3 = cs.mul(x2, x)
    cs.assert_eq(x3 + x + 5, y)
    return cs


def test_cubic_prove_verify():
    g16 = Groth16("bn254")
    x = 3
    y = x**3 + x + 5
    cs = _cubic_circuit(x, y)
    assert cs.check_satisfied()
    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=7, s_rand=11)
    assert g16.verify(vk, proof, [y])
    assert not g16.verify(vk, proof, [y + 1])


def test_poseidon_preimage_circuit():
    """Prove knowledge of a Poseidon preimage — exercises a real gadget."""
    from davinci_tpu.hash import poseidon_hash

    g16 = Groth16("bn254")
    pre = [123456789, 987654321]
    h = poseidon_hash(pre)

    cs = ConstraintSystem(F.BN254_R)
    h_pub = cs.pub_input(h)
    a = cs.priv_input(pre[0])
    b = cs.priv_input(pre[1])
    out = cs.poseidon([a, b])
    cs.assert_eq(out, h_pub)
    assert cs.check_satisfied()
    assert len(cs.constraints) > 200  # sanity: real poseidon circuit

    pk, vk = g16.setup(cs)
    proof = g16.prove(pk, cs, r_rand=1, s_rand=2)
    assert g16.verify(vk, proof, [h])
    assert not g16.verify(vk, proof, [(h + 1) % F.BN254_R])


def test_unsatisfied_witness_rejected():
    g16 = Groth16("bn254")
    cs = _cubic_circuit(3, 99)  # wrong public value
    assert not cs.check_satisfied()
    pk, vk = g16.setup(cs)
    with pytest.raises(AssertionError):
        g16.prove(pk, cs)


def test_gadgets():
    cs = ConstraintSystem(F.BN254_R)
    a = cs.priv_input(5)
    b = cs.priv_input(0)
    assert cs.is_zero(b).value == 1
    assert cs.is_zero(a).value == 0
    assert cs.select(cs.is_zero(b), a, cs.constant(9)).value == 5
    assert cs.inv(a).value == pow(5, -1, F.BN254_R)
    bits = cs.to_bits(a, 4)
    assert [x.value for x in bits] == [1, 0, 1, 0]
    cs.assert_lt_const(a, 16, 4)
    assert cs.check_satisfied()


def test_segmented_msm_matches():
    """_msm_enc folds fixed-size segments with host adds: must equal the
    single-shot MSM (covers the multi-million-point PK streaming path)."""
    import numpy as np
    import random

    from davinci_tpu import curves as C
    from davinci_tpu.ec import get_device_curve
    from davinci_tpu.groth16 import Groth16
    from davinci_tpu.groth16.bases import EncodedBases

    g16 = Groth16("bn254")
    spec, dc = C.bn254_g1, g16.dc
    r = random.Random(44)
    n = 50
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    pts[7] = spec.infinity()
    bases = EncodedBases.from_host_points(dc, pts)
    scalars = [r.randrange(spec.r) for _ in range(n)]
    scalars[3] = 0
    want = g16._msm_enc(dc, spec, bases, scalars)
    old_seg = Groth16.MSM_SEGMENT
    try:
        Groth16.MSM_SEGMENT = 16  # force 4 segments incl. a padded tail
        got = g16._msm_enc(dc, spec, bases, scalars)
    finally:
        Groth16.MSM_SEGMENT = old_seg
    assert got == want
