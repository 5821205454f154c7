"""In-circuit algebra gadget tests: extension towers vs the host tower
oracle (towers.FF), affine curve gadget vs host AffinePoint ops, and the
aux-offset MSM — native (2-chain) and emulated instantiations."""

import random

import pytest

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.circuits.algebra import (
    CubicOps,
    NativeOps,
    QuadOps,
    WeierstrassGadget,
    assert_bits_lt_const,
    aux_point,
)
from davinci_tpu.circuits.emulated import EmulatedOps
from davinci_tpu.groth16 import ConstraintSystem
from davinci_tpu.towers import FF


def _native_bls377_tower(cs):
    """In-circuit BLS12-377 Fp tower over a BW6-761-Fr circuit (native:
    BW6-761's scalar field IS BLS12-377's base field — the 2-chain)."""
    base = NativeOps(cs)
    fp2 = QuadOps(base, base.constant(C.fp2_bls377.nr))
    fp6 = CubicOps(fp2, fp2.constant(C.fp6_bls377.nr))
    fp12 = QuadOps(fp6, fp6.constant(C.fp12_bls377.nr))
    return base, fp2, fp6, fp12


def test_native_tower_matches_host_oracle():
    assert F.BW6_761_R == F.BLS12_377_P  # the 2-chain identity
    cs = ConstraintSystem(F.BW6_761_R)
    base, fp2, fp6, fp12 = _native_bls377_tower(cs)
    rng = random.Random(5)

    a_h = C.fp12_bls377.rand(rng)
    b_h = C.fp12_bls377.rand(rng)
    a = fp12.alloc(a_h.v)
    b = fp12.alloc(b_h.v)

    assert fp12.value(fp12.mul(a, b)) == (a_h * b_h).v
    assert fp12.value(fp12.add(a, b)) == (a_h + b_h).v
    assert fp12.value(fp12.inv(a)) == a_h.inv().v
    assert fp12.value(fp12.square(a)) == (a_h * a_h).v

    a2_h = C.fp2_bls377.rand(rng)
    a2 = fp2.alloc(a2_h.v)
    assert fp2.value(fp2.mul_by_nonresidue(a2)) == FF(
        C.fp2_bls377, C.fp2_bls377.mul_by_nonresidue(a2_h.v)
    ).v
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_emulated_fp2_matches_host():
    """BN254 Fp2 emulated inside a BLS12-377 circuit (circuit-2 case)."""
    cs = ConstraintSystem(F.BLS12_377_R)
    E = EmulatedOps(cs, F.BN254_P)
    fp2 = QuadOps(E, E.constant(C.fp2_bn254.nr % F.BN254_P))
    rng = random.Random(9)
    a_h = C.fp2_bn254.rand(rng)
    b_h = C.fp2_bn254.rand(rng)
    a = fp2.alloc(a_h.v)
    b = fp2.alloc(b_h.v)
    got = fp2.mul(a, b)
    assert tuple(E.value(x) for x in got) == (a_h * b_h).v
    inv = fp2.inv(a)
    assert tuple(E.value(x) for x in inv) == a_h.inv().v
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_curve_gadget_native_bls377_g1():
    cs = ConstraintSystem(F.BW6_761_R)
    base = NativeOps(cs)
    g = WeierstrassGadget(base, base.constant(C.bls377_g1.b_ff.v))
    rng = random.Random(11)
    P_h = C.bls377_g1.gen.mul(rng.randrange(2, C.bls377_g1.r))
    Q_h = C.bls377_g1.gen.mul(rng.randrange(2, C.bls377_g1.r))
    P = g.alloc_point(P_h)
    Q = g.alloc_point(Q_h)
    g.assert_on_curve(P)
    s = g.add_unequal(P, Q)
    d = g.double(P)
    assert g.value(s) == (P_h.add(Q_h).x.v, P_h.add(Q_h).y.v)
    assert g.value(d) == (P_h.add(P_h).x.v, P_h.add(P_h).y.v)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_curve_gadget_g2_over_fp2_tower():
    """BLS12-377 G2 (coords in Fp2) in-circuit over the native tower."""
    cs = ConstraintSystem(F.BW6_761_R)
    base, fp2, _, _ = _native_bls377_tower(cs)
    g = WeierstrassGadget(fp2, fp2.constant(C.bls377_g2.b_ff.v))
    rng = random.Random(13)
    P_h = C.bls377_g2.gen.mul(rng.randrange(2, C.bls377_g2.r))
    Q_h = C.bls377_g2.gen.mul(rng.randrange(2, C.bls377_g2.r))
    P = (fp2.alloc(P_h.x.v), fp2.alloc(P_h.y.v))
    Q = (fp2.alloc(Q_h.x.v), fp2.alloc(Q_h.y.v))
    g.assert_on_curve(P)
    s = g.add_unequal(P, Q)
    want = P_h.add(Q_h)
    assert g.value(s) == (want.x.v, want.y.v)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_msm_with_aux_matches_host():
    cs = ConstraintSystem(F.BW6_761_R)
    base = NativeOps(cs)
    g = WeierstrassGadget(base, base.constant(C.bls377_g1.b_ff.v))
    rng = random.Random(17)
    nbits = 16
    k1 = C.bls377_g1.gen.mul(3)
    k2 = C.bls377_g1.gen.mul(77777)
    s1, s2 = rng.randrange(1 << nbits), rng.randrange(1 << nbits)

    def bits_of(v):
        out = []
        for i in range(nbits):
            b = cs.priv_input((v >> i) & 1)
            cs.assert_bool(b)
            out.append(b)
        return out

    T = aux_point(C.bls377_g1)
    got = g.msm_with_aux([bits_of(s1), bits_of(s2)], [k1, k2], T, nbits)
    want = k1.mul(s1).add(k2.mul(s2))
    assert g.value(got) == (want.x.v, want.y.v)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_add_unequal_degenerate_is_unsat():
    cs = ConstraintSystem(F.BW6_761_R)
    base = NativeOps(cs)
    g = WeierstrassGadget(base, base.constant(C.bls377_g1.b_ff.v))
    P_h = C.bls377_g1.gen.mul(5)
    P = g.alloc_point(P_h)
    Q = g.alloc_point(P_h)
    g.add_unequal(P, Q)  # P == Q: x-difference not invertible
    assert not cs.check_satisfied()


def test_assert_bits_lt_const():
    cs = ConstraintSystem(F.BN254_R)
    v = 0b1011
    bits = [cs.priv_input((v >> i) & 1) for i in range(6)]
    for b in bits:
        cs.assert_bool(b)
    assert_bits_lt_const(cs, bits, 0b1100)
    assert cs.check_satisfied()

    cs2 = ConstraintSystem(F.BN254_R)
    bits2 = [cs2.priv_input((12 >> i) & 1) for i in range(6)]
    assert_bits_lt_const(cs2, bits2, 12)  # 12 < 12 is false
    assert not cs2.check_satisfied()
