"""Circuit 3 (aggregator) tests: native BW6-761 circuit recursively
verifying real BLS12-377 proofs with dummy padding and latch mask
(reference circuits/aggregator/aggregator.go:18-56).  CI uses a reduced
batch (N=4) and a cheap BLS12-377 inner circuit standing in for the vote
verifier (same VK mechanics); the full 60-slot build is gated."""

import os

import pytest

pytestmark = pytest.mark.heavy

from davinci_tpu import fields as F
from davinci_tpu.circuits.aggregator import (
    AggregatorParams,
    AggregatorWitness,
    batch_hash,
    build_aggregator_circuit,
)
from davinci_tpu.groth16 import ConstraintSystem, Groth16


@pytest.fixture(scope="module")
def inner_proofs():
    """Real BLS12-377 proofs of a small circuit with 1 public input (the
    vote-hash stand-in)."""
    g16 = Groth16("bls12_377")

    def prove(x_v):
        cs = ConstraintSystem(F.BLS12_377_R)
        h = cs.pub_input(x_v * x_v % F.BLS12_377_R)
        x = cs.priv_input(x_v)
        cs.assert_eq(cs.mul(x, x), h)
        return cs

    cs0 = prove(777)
    pk, vk = g16.setup(cs0)
    out = []
    for x_v in (777, 1234, 987654321):
        cs = prove(x_v)
        proof = g16.prove(pk, cs, r_rand=x_v, s_rand=x_v + 1)
        pub = cs.public_values()[0]
        assert g16.verify(vk, proof, [pub])
        out.append((pub, proof))
    return vk, out


def _params(vk, out, n=4):
    dummy_pub, dummy_proof = out[0]
    return AggregatorParams(
        inner_vk=vk, dummy_proof=dummy_proof, dummy_public=dummy_pub, n_votes=n
    )


def test_aggregator_satisfiable_with_padding(inner_proofs):
    vk, out = inner_proofs
    params = _params(vk, out)
    w = AggregatorWitness(
        vote_hashes=[out[1][0], out[2][0]],
        proofs=[out[1][1], out[2][1]],
    )
    cs = build_aggregator_circuit(params, w)
    assert cs.num_public == 1
    assert cs.public_values() == [batch_hash(params, w)]
    assert cs.check_satisfied()
    # ~25k per verified proof + ~200k fixed keccak batch-hash overhead
    assert len(cs.constraints) < 250_000 + 60_000 * params.n_votes


def test_aggregator_latch_mask_enforced(inner_proofs):
    vk, out = inner_proofs
    params = _params(vk, out)
    w = AggregatorWitness(vote_hashes=[out[1][0]], proofs=[out[1][1]])
    cs = build_aggregator_circuit(params, w)
    assert cs.check_satisfied()
    # flip a later mask bit on (1,0,1,0 pattern): latch must reject
    mask_vars = [i for i, v in enumerate(cs.values) if v in (0, 1)]
    # find the mask allocations: they are the first 4 private bools after
    # the public input; locate by structure via scope labels instead
    labels = {i: l for i, l in cs._labels.items() if "vote-mask" in l}
    assert labels, "mask scope missing"
    # tamper: set the 3rd mask variable (index of value 0 right after the
    # first two allocations: public, mask0, mask1, mask2...)
    idx = 4  # [1(one), batch_hash, mask0, mask1, mask2][...]
    assert cs.values[idx] == 0
    cs.values[idx] = 1
    assert not cs.check_satisfied()


def test_aggregator_wrong_vote_hash_rejected(inner_proofs):
    vk, out = inner_proofs
    params = _params(vk, out)
    w = AggregatorWitness(
        vote_hashes=[(out[1][0] + 1) % F.BW6_761_R], proofs=[out[1][1]]
    )
    with pytest.raises(AssertionError):
        build_aggregator_circuit(params, w)


@pytest.mark.skipif(
    not os.environ.get("RUN_HEAVY_CIRCUITS"),
    reason="full 60-slot aggregator build is heavy; set RUN_HEAVY_CIRCUITS=1",
)
def test_aggregator_full_batch_60(inner_proofs):
    vk, out = inner_proofs
    params = _params(vk, out, n=60)
    w = AggregatorWitness(
        vote_hashes=[h for h, _ in out[1:]], proofs=[p for _, p in out[1:]]
    )
    cs = build_aggregator_circuit(params, w)
    print(
        f"\naggregator 60-slot build: {len(cs.constraints):,} constraints, "
        f"{cs.num_variables:,} variables"
    )
    assert cs.check_satisfied()
