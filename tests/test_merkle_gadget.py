"""SMT transition gadget vs the host SMT oracle (reference
circuits/merkleproof/merkleproof.go:133-229 MerkleTransition).  Covers
insert-into-empty, insert-with-collision (leaf pushdown), update, noop,
empty-tree first insert, and root-tamper attacks."""

import random

import pytest

from davinci_tpu import fields as F
from davinci_tpu.circuits.merkle_gadget import (
    smt_transition_gadget,
    transition_to_gadget_inputs,
)
from davinci_tpu.groth16 import ConstraintSystem
from davinci_tpu.state.smt import SMT

N_LEVELS = 16  # CI scale; production uses 64 (parameter only)


def _apply(cs, t):
    old_r = cs.priv_input(t.old_root)
    new_r = cs.priv_input(t.new_root)
    inputs = transition_to_gadget_inputs(cs, t, N_LEVELS)
    smt_transition_gadget(cs, N_LEVELS, old_r, new_r, **inputs)
    return old_r, new_r


def test_transition_chain_matches_host():
    rng = random.Random(0xA11CE)
    smt = SMT(max_levels=N_LEVELS)
    cs = ConstraintSystem(F.BN254_R)
    keys = [rng.randrange(1 << N_LEVELS) for _ in range(8)]
    ts = []
    for k in keys:
        ts.append(smt.insert(k, rng.randrange(1 << 60)))
    ts.append(smt.update(keys[2], 999))
    ts.append(smt.update(keys[5], 111))
    for t in ts:
        _apply(cs, t)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_first_insert_into_empty_tree():
    smt = SMT(max_levels=N_LEVELS)
    t = smt.insert(5, 42)
    cs = ConstraintSystem(F.BN254_R)
    _apply(cs, t)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_collision_insert_pushdown():
    """Keys sharing low bits force multi-level pushdown."""
    smt = SMT(max_levels=N_LEVELS)
    smt.insert(0b0000_0001, 7)
    t = smt.insert(0b1100_0001, 8)  # shares 6 low bits
    assert t.fnc0 == 1 and not t.is_old0
    cs = ConstraintSystem(F.BN254_R)
    _apply(cs, t)
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_noop_requires_equal_roots():
    smt = SMT(max_levels=N_LEVELS)
    t = smt.insert(3, 9)
    cs = ConstraintSystem(F.BN254_R)
    old_r = cs.priv_input(t.new_root)
    new_r = cs.priv_input(t.new_root)
    inputs = transition_to_gadget_inputs(cs, t, N_LEVELS)
    inputs["fnc0"] = cs.priv_input(0)
    inputs["fnc1"] = cs.priv_input(0)
    smt_transition_gadget(cs, N_LEVELS, old_r, new_r, **inputs)
    assert cs.check_satisfied()

    cs2 = ConstraintSystem(F.BN254_R)
    old_r = cs2.priv_input(t.old_root)
    new_r = cs2.priv_input(t.new_root)  # different
    inputs = transition_to_gadget_inputs(cs2, t, N_LEVELS)
    inputs["fnc0"] = cs2.priv_input(0)
    inputs["fnc1"] = cs2.priv_input(0)
    smt_transition_gadget(cs2, N_LEVELS, old_r, new_r, **inputs)
    assert not cs2.check_satisfied()


def test_tampered_new_root_unsat():
    smt = SMT(max_levels=N_LEVELS)
    smt.insert(1, 1)
    t = smt.insert(2, 2)
    cs = ConstraintSystem(F.BN254_R)
    old_r = cs.priv_input(t.old_root)
    new_r = cs.priv_input((t.new_root + 1) % F.BN254_R)
    inputs = transition_to_gadget_inputs(cs, t, N_LEVELS)
    smt_transition_gadget(cs, N_LEVELS, old_r, new_r, **inputs)
    assert not cs.check_satisfied()


def test_tampered_value_unsat():
    smt = SMT(max_levels=N_LEVELS)
    smt.insert(1, 1)
    t = smt.update(1, 77)
    cs = ConstraintSystem(F.BN254_R)
    old_r = cs.priv_input(t.old_root)
    new_r = cs.priv_input(t.new_root)
    inputs = transition_to_gadget_inputs(cs, t, N_LEVELS)
    inputs["value"] = cs.priv_input(78)  # claim a different written value
    smt_transition_gadget(cs, N_LEVELS, old_r, new_r, **inputs)
    assert not cs.check_satisfied()
