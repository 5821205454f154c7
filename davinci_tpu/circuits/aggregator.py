"""Aggregator (circuit 3, BW6-761): recursively verifies up to
VOTES_PER_BATCH vote-verifier proofs (BLS12-377) with dummy padding.

Statement (reference circuits/aggregator/aggregator.go:18-56, FillWithDummy
helpers.go:19-30, canonical dummy voteverifier/dummy.go:14-60):
  public:  batch_hash = MultiPoseidon_{BW6Fr}(valid_count,
                          mask_1*vote_hash_1, ..., mask_N*vote_hash_N)
  private: N vote hashes, N proofs, the latch mask.
  checks:
    * mask bits are boolean and non-increasing (real votes form a prefix —
      the reference's latch, aggregator.go:27);
    * valid_count == sum(mask);
    * EVERY slot's proof verifies under the vote-verifier VK against that
      slot's public vote hash (dummy slots carry the canonical dummy proof
      + dummy hash — real proofs of the dummy witness, exactly the
      reference's padding model);
    * the public batch hash binds count + masked hashes.

This is NATIVE recursion: BW6-761's scalar field is BLS12-377's base
field, so the in-circuit pairing costs ~20k constraints per proof — the
whole reason the 2-chain exists.
"""

from __future__ import annotations

from dataclasses import dataclass

from davinci_tpu import fields as F
from davinci_tpu import spec as protocol
from davinci_tpu.circuits import gadgets as G
from davinci_tpu.circuits.pairing_gadget import Groth16VerifierGadget
from davinci_tpu.groth16.r1cs import ConstraintSystem
from davinci_tpu.hash.poseidon import multi_poseidon
from davinci_tpu.pairing import bls377_pairing


@dataclass
class AggregatorParams:
    inner_vk: object          # vote-verifier VerifyingKey (BLS12-377)
    dummy_proof: object       # canonical padding proof (valid!)
    dummy_public: int         # its public vote hash
    n_votes: int = protocol.VOTES_PER_BATCH
    native_r: int = F.BW6_761_R

    def circuit_id(self) -> str:
        return f"aggregator-{self.n_votes}-v1"


@dataclass
class AggregatorWitness:
    vote_hashes: list         # real slots only (len = valid count)
    proofs: list              # matching proofs

    def padded(self, params: AggregatorParams):
        n = params.n_votes
        assert len(self.proofs) <= n
        vh = list(self.vote_hashes) + [params.dummy_public] * (
            n - len(self.vote_hashes)
        )
        pf = list(self.proofs) + [params.dummy_proof] * (n - len(self.proofs))
        mask = [1] * len(self.proofs) + [0] * (n - len(self.proofs))
        return vh, pf, mask


def batch_hash(params: AggregatorParams, witness: AggregatorWitness) -> int:
    vh, _, mask = witness.padded(params)
    inputs = [len(witness.proofs)] + [
        h if m else 0 for h, m in zip(vh, mask)
    ]
    return multi_poseidon(inputs, p=params.native_r)


def build_aggregator_circuit(
    params: AggregatorParams, witness: AggregatorWitness
) -> ConstraintSystem:
    cs = ConstraintSystem(params.native_r)
    bh_pub = cs.pub_input(batch_hash(params, witness))

    vh_vals, proofs, mask_vals = witness.padded(params)
    mask = []
    with cs.scope("vote-mask"):
        for m in mask_vals:
            b = cs.priv_input(m)
            cs.assert_bool(b)
            mask.append(b)
        # latch: once off, stays off (mask[i+1] <= mask[i])
        for i in range(len(mask) - 1):
            cs.assert_eq(cs.mul(mask[i + 1], cs.one - mask[i]), cs.constant(0))
        count = cs.constant(0)
        for b in mask:
            count = count + b

    gadget = Groth16VerifierGadget(cs, bls377_pairing, params.inner_vk)
    hash_inputs = [count]
    for i in range(params.n_votes):
        with cs.scope(f"verify-{i}"):
            vh = cs.priv_input(vh_vals[i])
            bits = gadget.scalar_bits_from_native(vh)
            pv = gadget.alloc_proof(proofs[i])
            gadget.assert_valid(pv, [bits])
            hash_inputs.append(cs.mul(mask[i], vh))

    with cs.scope("batch-hash"):
        bound = G.multi_poseidon_gadget(cs, hash_inputs)
        cs.assert_eq(bound, bh_pub)
    return cs
