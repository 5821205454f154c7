"""Election state machine: init root parity, vote batches, overwrites,
results accumulation, rollback."""

import random

from davinci_tpu import spec
from davinci_tpu.elgamal import Ballot, decrypt, generate_key
from davinci_tpu.state import State, Vote, ballot_index_key


def _mk_vote(r, pub, idx, msgs, weight=1):
    b = Ballot.encrypt(msgs, pub, r.randrange(1, 2**200))
    reenc, _ = b.reencrypt(pub, r.randrange(1, 2**200))
    return Vote(
        address=r.randrange(2**160),
        ballot_index=ballot_index_key(idx),
        vote_id=spec.VOTE_ID_MIN + r.randrange(2**40),
        ballot=b,
        reencrypted_ballot=reenc,
        weight=weight,
    )


def test_init_root_matches_spec():
    st = State(process_id=777)
    root = st.initialize(census_origin=1, ballot_mode_packed=99, enc_key=(5, 6))
    assert root == spec.state_root(777, 1, 5, 6, 99)


def test_vote_batch_and_results():
    r = random.Random(42)
    pub, priv = generate_key(r)
    st = State(process_id=1)
    st.initialize(1, 0, (pub.x, pub.y))

    msgs1 = [1, 0, 2, 0, 0, 0, 0, 1]
    msgs2 = [0, 3, 1, 0, 1, 0, 0, 0]
    v1 = _mk_vote(r, pub, 0, msgs1)
    v2 = _mk_vote(r, pub, 1, msgs2)
    batch = st.prepare_votes_batch([v1, v2])

    assert batch.root_before != batch.root_after
    assert batch.voters_count == 2 and batch.overwritten_count == 0
    assert len(batch.ballot_transitions) == spec.VOTES_PER_BATCH
    # noop padding
    assert batch.ballot_transitions[2].fnc0 == 0
    assert batch.ballot_transitions[2].fnc1 == 0

    # results decrypt to the elementwise sums
    for i, (c1, c2) in enumerate(batch.new_results.ciphertexts):
        _, m = decrypt(pub, priv, c1, c2, 100)
        assert m == msgs1[i] + msgs2[i]

    # process proofs verify against root_before
    from davinci_tpu.state import SMT

    for p in batch.process_proofs.values():
        assert p.root == batch.root_before
        assert SMT.verify_proof(p)


def test_vote_overwrite_subtracts():
    r = random.Random(43)
    pub, priv = generate_key(r)
    st = State(process_id=2)
    st.initialize(1, 0, (pub.x, pub.y))

    v1 = _mk_vote(r, pub, 0, [5, 0, 0, 0, 0, 0, 0, 0])
    batch1 = st.prepare_votes_batch([v1])

    # same voter index overwrites: results must subtract the old ballot
    v2 = _mk_vote(r, pub, 0, [2, 0, 0, 0, 0, 0, 0, 0])
    v2.address = v1.address
    batch2 = st.prepare_votes_batch([v2])
    assert batch2.overwritten_count == 1
    c1, c2 = batch2.new_results.ciphertexts[0]
    _, m = decrypt(pub, priv, c1, c2, 100)
    assert m == 2  # not 7


def test_rollback():
    r = random.Random(44)
    pub, _ = generate_key(r)
    st = State(process_id=3)
    st.initialize(1, 0, (pub.x, pub.y))
    root0 = st.root
    st.prepare_votes_batch([_mk_vote(r, pub, 0, [1] * 8)])
    assert st.root != root0
    st.rollback_last_batch()
    assert st.root == root0
    assert st.results().is_zero()
