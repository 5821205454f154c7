"""Emulated (non-native) field gadget tests — the foundation of the
recursion chain (reference gnark std/math/emulated role).  All checks run
the inline witness builder and then verify R1CS satisfiability; soundness
is probed by tampering with allocated witness values."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.emulated import EmulatedOps
from davinci_tpu.groth16 import ConstraintSystem

SECP_P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F


@pytest.mark.parametrize(
    "native_r,emu_p",
    [
        (F.BLS12_377_R, F.BN254_P),  # circuit-2 case: BN254 inside BLS12-377
        (F.BLS12_377_R, SECP_P),     # ECDSA case: secp256k1 inside BLS12-377
        (F.BN254_R, F.BW6_761_P),    # circuit-4 case: BW6-761 inside BN254
        (F.BN254_R, F.BLS12_381_R),  # blob-eval case: BLS12-381 Fr in BN254
    ],
)
def test_emulated_field_ops(native_r, emu_p):
    cs = ConstraintSystem(native_r)
    E = EmulatedOps(cs, emu_p)
    rng = random.Random(hash((native_r, emu_p)) & 0xFFFF)

    a_v = rng.randrange(emu_p)
    b_v = rng.randrange(emu_p)
    a = E.alloc(a_v)
    b = E.alloc(b_v)

    assert E.value(E.add(a, b)) == (a_v + b_v) % emu_p
    assert E.value(E.sub(a, b)) == (a_v - b_v) % emu_p
    assert E.value(E.mul(a, b)) == a_v * b_v % emu_p
    assert E.value(E.neg(a)) == (-a_v) % emu_p
    assert E.value(E.inv(a)) == pow(a_v, -1, emu_p)
    assert E.value(E.div(a, b)) == a_v * pow(b_v, -1, emu_p) % emu_p
    assert E.value(E.smul(a, 7)) == 7 * a_v % emu_p

    # deep lazy-add chains auto-reduce and stay correct
    acc = a
    for _ in range(50):
        acc = E.add(acc, b)
    assert E.value(acc) == (a_v + 50 * b_v) % emu_p
    assert E.value(E.mul(acc, a)) == (a_v + 50 * b_v) * a_v % emu_p

    E.assert_eq(E.mul(a, b), E.mul(b, a))
    E.assert_is_zero(E.sub(a, a))

    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_emulated_mul_constraint_cost():
    """Document the per-mul constraint cost for the circuit-2 parameters."""
    cs = ConstraintSystem(F.BLS12_377_R)
    E = EmulatedOps(cs, F.BN254_P)
    a = E.alloc(1234567)
    b = E.alloc(7654321)
    n0 = len(cs.constraints)
    E.mul(a, b)
    cost = len(cs.constraints) - n0
    assert cost < 1500, f"emulated mul too expensive: {cost}"


def test_emulated_predicates():
    cs = ConstraintSystem(F.BLS12_377_R)
    E = EmulatedOps(cs, F.BN254_P)
    a = E.alloc(42)
    z = E.sub(a, a)
    one_b = E.is_zero(z)
    zero_b = E.is_zero(a)
    assert one_b.value == 1 and zero_b.value == 0

    cond = cs.priv_input(1)
    cs.assert_bool(cond)
    sel = E.select(cond, a, E.zero)
    assert E.value(sel) == 42

    bits = E.to_canonical_bits(a)
    assert sum(b.value << i for i, b in enumerate(bits)) == 42
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_emulated_soundness_tamper():
    """Corrupting an allocated quotient/remainder limb must break some
    constraint — the carry chain + range checks catch it."""
    cs = ConstraintSystem(F.BLS12_377_R)
    E = EmulatedOps(cs, F.BN254_P)
    a = E.alloc(3)
    b = E.alloc(5)
    r = E.mul(a, b)
    assert E.value(r) == 15
    assert cs.check_satisfied()

    # tamper with the product's first limb (+1)
    idx = next(iter(r.limbs[0].terms))
    cs.values[idx] = (cs.values[idx] + 1) % cs.p
    assert not cs.check_satisfied()
    cs.values[idx] = (cs.values[idx] - 1) % cs.p
    assert cs.check_satisfied()

    # tamper with a wrap-around attempt: add native-field multiples
    cs.values[idx] = (cs.values[idx] + (1 << E.w)) % cs.p
    assert not cs.check_satisfied()


def test_emulated_nonresidue_and_canonicity():
    """to_canonical_bits rejects a non-canonical representative when the
    witness is forged above p."""
    cs = ConstraintSystem(F.BN254_R)
    E = EmulatedOps(cs, F.BLS12_381_R)
    a = E.alloc(F.BLS12_381_R - 1)
    bits = E.to_canonical_bits(a)
    assert cs.check_satisfied()
    v = sum(b.value << i for i, b in enumerate(bits))
    assert v == F.BLS12_381_R - 1


def test_structure_is_witness_independent():
    """Two different witnesses must produce IDENTICAL circuit structure
    (constraint matrices + range-check widths) — the property that makes
    proving keys reusable (gnark CCS semantics)."""
    from davinci_tpu.groth16.serialize import cs_structure_hash

    def build(a_v, b_v):
        cs = ConstraintSystem(F.BLS12_377_R)
        E = EmulatedOps(cs, F.BN254_P)
        a, b = E.alloc(a_v), E.alloc(b_v)
        r = E.mul(a, b)
        E.assert_eq(E.mul(r, E.inv(b)), a)
        E.lincomb([(a, 12345), (b, F.BN254_P - 7)])
        E.cmul(a, F.BN254_P - 1)
        return cs

    h1 = cs_structure_hash(build(3, 5))
    h2 = cs_structure_hash(build(F.BN254_P - 2, 0xDEADBEEFCAFE))
    assert h1 == h2
