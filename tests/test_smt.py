"""SMT vs the reference's fixed state-root construction + proof semantics."""

import random

import pytest

from davinci_tpu import spec
from davinci_tpu.hash import poseidon_hash
from davinci_tpu.state import SMT
from davinci_tpu.state.smt import encode_leaf_value


def _init_tree(order):
    """Insert the 5 config leaves in the given order."""
    process_id, census_origin, pkx, pky, ballot_mode = 11, 1, 33, 44, 55
    t = SMT()
    leaves = {
        spec.STATE_KEY_PROCESS_ID: process_id,
        spec.STATE_KEY_CENSUS_ORIGIN: census_origin,
        spec.STATE_KEY_BALLOT_MODE: ballot_mode,
        spec.STATE_KEY_ENCRYPTION_KEY: encode_leaf_value([pkx, pky]),
        spec.STATE_KEY_RESULTS: spec.ZERO_BALLOT_HASH,
    }
    for k in order:
        t.insert(k, leaves[k])
    want = spec.state_root(process_id, census_origin, pkx, pky, ballot_mode)
    return t, want


def test_initial_state_root_matches_reference():
    keys = [0, 6, 2, 3, 4]
    t, want = _init_tree(keys)
    assert t.root == want


def test_history_independence():
    import itertools

    roots = set()
    for order in itertools.permutations([0, 6, 2, 3, 4]):
        t, want = _init_tree(order)
        roots.add(t.root)
        assert t.root == want
    assert len(roots) == 1


def test_proofs_and_transitions():
    t = SMT()
    r = random.Random(9)
    keys = [r.randrange(2**63, 2**64) for _ in range(50)]
    for k in keys:
        tr = t.insert(k, k * 7)
        assert tr.fnc0 == 1 and tr.fnc1 == 0
    for k in keys:
        p = t.prove(k)
        assert p.existence and p.value == k * 7
        assert SMT.verify_proof(p)
    # non-membership
    absent = 12345
    p = t.prove(absent)
    assert not p.existence
    assert SMT.verify_proof(p)
    # update
    tr = t.update(keys[0], 999)
    assert tr.fnc0 == 0 and tr.fnc1 == 1
    assert t.get(keys[0]) == 999
    p = t.prove(keys[0])
    assert p.value == 999 and SMT.verify_proof(p)


def test_tampered_proof_fails():
    t = SMT()
    for k in (1, 2, 5, 9):
        t.insert(k, 100 + k)
    p = t.prove(5)
    p.value = 1
    assert not SMT.verify_proof(p)
