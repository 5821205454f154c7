"""State transition (circuit 4, BN254): one proof per batch attesting the
election state tree advanced correctly for up to 60 votes.

Statement (reference circuits/statetransition/statetransition.go:118-144):
  public:  root_before, root_after, batch_hash (the aggregator's public),
           blob_z, blob_y (the EIP-4844 evaluation binding)
  private: the 60 votes (original + re-encrypted ballots, addresses,
           weights, vote ids, re-encryption randomness), the SMT
           transitions, the process-config inclusion proofs, and the
           aggregator proof (BW6-761).
  checks:
    1. process config (id, ballot mode, encryption key, census origin)
       proven under root_before;
    2. the transition chain: root_before -> (ballot write, voteID write)
       per vote -> results write -> root_after, each a MerkleTransition
       (circuits/merkle_gadget.py; reference VerifyRootTransition:336);
    3. per vote: re-encryption correctness — reencrypted = original +
       Enc(0; k) under the process key (VerifyReencryptedVotes:265);
    4. homomorphic tally: new_results = old_results + sum(reencrypted) -
       sum(overwritten)  (VerifyBallots:465);
    5. the per-vote hashes (BN254 Poseidon — NATIVE here, emulated in
       circuit 2) recomputed from the vote data, folded into the keccak
       batch hash that must equal the aggregator's public input;
    6. [verify_aggregator] the BW6-761 aggregator proof verifies
       in-circuit (emulated; VerifyAggregatorProof:240) — heavyweight,
       parameterized off for CI (the binding in 5 still ties the public);
    7. [blob binding] z = keccak-derived evaluation point and y the
       barycentric evaluation of the batch blob (VerifyBlobs:400) — wired
       through circuits/blob_gadget when enabled.

Batch size / tree depth / sub-gadget toggles are compile-time parameters:
production (60 votes, 64 levels, everything on) vs CI-reduced builds run
the identical gadget code.
"""

from __future__ import annotations

from dataclasses import dataclass

from davinci_tpu import fields as F
from davinci_tpu import spec as protocol
from davinci_tpu.circuits import gadgets as G
from davinci_tpu.circuits.keccak_gadget import keccak256_bits
from davinci_tpu.circuits.merkle_gadget import (
    smt_transition_gadget,
    transition_to_gadget_inputs,
)
from davinci_tpu.groth16.r1cs import ConstraintSystem
from davinci_tpu.hash.poseidon import poseidon_hash

VOTE_HASH_BITS = 252


@dataclass
class StateTransitionParams:
    n_votes: int = protocol.VOTES_PER_BATCH
    n_levels: int = 64
    n_fields: int = protocol.FIELDS_PER_BALLOT
    native_r: int = F.BN254_R
    verify_aggregator: bool = False   # emulated BW6 pairing (gated: heavy)
    agg_vk: object = None             # aggregator VerifyingKey when enabled
    include_census: bool = True       # census eligibility sub-circuit
    census_levels: int = 20           # max LeanIMT depth (2^20 voters)

    def circuit_id(self) -> str:
        cen = f"-c{self.census_levels}" if self.include_census else "-nocen"
        return (
            f"statetransition-{self.n_votes}v-{self.n_levels}l{cen}"
            f"{'-aggv' if self.verify_aggregator else ''}-v1"
        )


@dataclass
class StateTransitionWitness:
    batch: object                 # state.BatchResult
    process_id: int
    ballot_mode_packed: int
    encryption_key: tuple         # (x, y)
    census_origin: int
    reenc_k: list                 # per-vote re-encryption master randomness
    inputs_hashes: list           # per-vote circuit-1 ballot inputs hash
    agg_proof: object = None      # BW6 aggregator proof (when verifying)
    census_root: int = 0          # LeanIMT root / CSP root (public)
    census_proofs: list = None    # per-vote census proof dicts (see below)
    # census_proofs[i] for a real vote is either
    #   {"kind": "merkle", "siblings": [...], "actives": [...],
    #    "index_bits": [...], "index": int}    (LeanIMT.prove_circuit)
    # or
    #   {"kind": "csp", "public": (x, y), "r8": (x, y), "s": int,
    #    "voter_index": int}                    (csp.generate_proof, TE)

    def vote_hash(self, i: int, hash_p: int) -> int:
        v = self.batch.votes[i]
        h = poseidon_hash(
            [self.process_id, v.address, v.vote_id, self.inputs_hashes[i]],
            p=hash_p,
        )
        return h & ((1 << VOTE_HASH_BITS) - 1)

    def batch_hash(self, params) -> int:
        from davinci_tpu.ethereum import keccak256

        n = len(self.batch.votes)
        data = bytes([n])
        for i in range(params.n_votes):
            if i < n:
                data += self.vote_hash(i, params.native_r).to_bytes(32, "big")
            else:
                data += (0).to_bytes(32, "big")
        return int.from_bytes(keccak256(data)[:31], "big")


def build_state_transition_circuit(
    params: StateTransitionParams, w: StateTransitionWitness
) -> ConstraintSystem:
    cs = ConstraintSystem(params.native_r)
    batch = w.batch
    n = params.n_votes
    nv = len(batch.votes)
    assert nv <= n

    # -- public inputs ------------------------------------------------------
    root_before = cs.pub_input(batch.root_before)
    root_after = cs.pub_input(batch.root_after)
    batch_hash_pub = cs.pub_input(w.batch_hash(params))
    census_root = (
        cs.pub_input(w.census_root) if params.include_census else None
    )

    # -- process config under root_before -----------------------------------
    pid = cs.priv_input(w.process_id)
    bm = cs.priv_input(w.ballot_mode_packed)
    ek = (cs.priv_input(w.encryption_key[0]), cs.priv_input(w.encryption_key[1]))
    corig = cs.priv_input(w.census_origin)
    with cs.scope("process-config"):
        _assert_inclusion(
            cs, params, root_before, batch.process_proofs["id"],
            protocol.STATE_KEY_PROCESS_ID, [pid],
        )
        _assert_inclusion(
            cs, params, root_before, batch.process_proofs["ballot_mode"],
            protocol.STATE_KEY_BALLOT_MODE, [bm],
        )
        _assert_inclusion(
            cs, params, root_before, batch.process_proofs["encryption_key"],
            protocol.STATE_KEY_ENCRYPTION_KEY, [ek[0], ek[1]],
        )
        _assert_inclusion(
            cs, params, root_before, batch.process_proofs["census_origin"],
            protocol.STATE_KEY_CENSUS_ORIGIN, [corig],
        )

    # census origin switch (reference VerifyIsValidCensusOrigin + the
    # census/gnark.go predicates); exactly one family must hold
    if params.include_census:
        from davinci_tpu.circuits.census_gadget import (
            csp_eddsa_verify,
            is_csp_origin,
            is_merkle_origin,
            leanimt_verify,
            pack_census_leaf_gadget,
        )

        is_mk = is_merkle_origin(cs, corig)
        is_csp = is_csp_origin(cs, corig)
        cs.assert_eq(is_mk + is_csp, cs.one)

    # -- transition chain ----------------------------------------------------
    roots = [root_before]

    def apply_transition(t, label):
        with cs.scope(label):
            old_r = roots[-1]
            new_r = cs.priv_input(t.new_root)
            inputs = transition_to_gadget_inputs(cs, t, params.n_levels)
            smt_transition_gadget(
                cs, params.n_levels, old_r, new_r, **inputs
            )
            roots.append(new_r)
            return inputs

    vote_hash_bits_all = []
    reenc_sum = None
    over_sum = None
    mask = []
    for i in range(n):
        real = i < nv
        v = batch.votes[i] if real else None
        m = cs.priv_input(1 if real else 0)
        cs.assert_bool(m)
        mask.append(m)
        if i > 0:
            # latch: real votes form a prefix
            cs.assert_eq(cs.mul(m, cs.one - mask[i - 1]), cs.constant(0))

        bt = batch.ballot_transitions[i]
        vt = batch.voteid_transitions[i]
        b_inputs = apply_transition(bt, f"ballot-{i}")
        v_inputs = apply_transition(vt, f"voteid-{i}")
        # masked slots are noops; real slots are real writes
        for tri in (b_inputs, v_inputs):
            enabled_t = tri["fnc0"] + tri["fnc1"]
            cs.assert_eq(cs.mul(cs.one - m, enabled_t), cs.constant(0))
            cs.assert_eq(cs.mul(m, cs.one - enabled_t), cs.constant(0))

        with cs.scope(f"vote-{i}"):
            if real:
                orig = [cs.priv_input(c) for c in v.ballot.coords()]
                reenc = [
                    cs.priv_input(c) for c in v.reencrypted_ballot.coords()
                ]
                over = [
                    cs.priv_input(c) for c in v.overwritten_ballot.coords()
                ]
                addr = cs.priv_input(v.address)
                weight = cs.priv_input(v.weight)
                vid = cs.priv_input(v.vote_id)
                bidx = cs.priv_input(v.ballot_index)
                ih = cs.priv_input(w.inputs_hashes[i])
                k_master = cs.priv_input(w.reenc_k[i])
            else:
                zero_coords = [cs.constant(0)] * (params.n_fields * 4)
                orig = reenc = over = zero_coords
                addr = weight = vid = ih = cs.constant(0)
                bidx = cs.constant(0)
                k_master = cs.constant(0)

            if real:
                # 3. re-encryption: reenc_j = orig_j + Enc(0; k_j), chained
                # randomness k_1 = Poseidon(k), k_{j+1} = Poseidon(k_j)
                # (mirrors elgamal Ballot.reencrypt semantics)
                kj = cs.poseidon([k_master])
                for j in range(params.n_fields):
                    kb = G.to_bits_canonical(cs, kj, 254)
                    kg = G.te_base_mul_bits(cs, kb)
                    kpk = G.te_scalar_mul_bits(cs, ek, kb)
                    c1o = (orig[4 * j], orig[4 * j + 1])
                    c2o = (orig[4 * j + 2], orig[4 * j + 3])
                    c1n = G.te_add(cs, c1o, kg)
                    c2n = G.te_add(cs, c2o, kpk)
                    cs.assert_eq(c1n[0], reenc[4 * j])
                    cs.assert_eq(c1n[1], reenc[4 * j + 1])
                    cs.assert_eq(c2n[0], reenc[4 * j + 2])
                    cs.assert_eq(c2n[1], reenc[4 * j + 3])
                    if j + 1 < params.n_fields:
                        kj = cs.poseidon([kj])

                # ballot-leaf binding: the written leaf value commits the
                # re-encrypted ballot + address + weight
                leaf_val = G.multi_poseidon_gadget(
                    cs, reenc + [addr, weight]
                )
                cs.assert_eq(leaf_val, b_inputs["value"])
                # overwritten binding: an UPDATE overwrites this voter's
                # previous leaf (a collision-INSERT's old_value is some
                # other key's leaf — not an overwrite)
                old_leaf_val = G.multi_poseidon_gadget(
                    cs, over + [addr, weight]
                )
                cs.assert_eq(
                    cs.mul(
                        b_inputs["fnc1"], old_leaf_val - b_inputs["old_value"]
                    ),
                    cs.constant(0),
                )
                # fresh voters (insert) must claim a zero overwritten ballot
                zero_b = _is_zero_ballot(cs, over)
                cs.assert_eq(
                    cs.mul(b_inputs["fnc0"], cs.one - zero_b),
                    cs.constant(0),
                )

            # 4. tally accumulation (masked TE point sums)
            reenc_sum = _acc_ballot(cs, params, reenc_sum, reenc, m)
            over_sum = _acc_ballot(cs, params, over_sum, over, m)

            # ballot write key binding: key == ballot_index (reference
            # VerifyMerkleTransitionKeys: Ballot[i].VerifyNewKey)
            bkey = cs.from_bits(b_inputs["key_bits"])
            cs.assert_eq(cs.mul(m, bkey - bidx), cs.constant(0))

            # voteID write binding: key == voteID, fixed leaf value
            vkey = cs.from_bits(v_inputs["key_bits"])
            cs.assert_eq(cs.mul(m, vkey - vid), cs.constant(0))
            cs.assert_eq(
                cs.mul(
                    m,
                    v_inputs["value"]
                    - cs.constant(protocol.VOTE_ID_LEAF_VALUE),
                ),
                cs.constant(0),
            )

            # 5. per-vote hash (native Poseidon over BN254)
            vh = cs.poseidon([pid, addr, vid, ih])
            vh_bits = G.to_bits_canonical(cs, vh, 254)[:VOTE_HASH_BITS]
            vote_hash_bits_all.append([cs.mul(m, b) for b in vh_bits])

        # 6. census eligibility (VerifyMerkleCensusProofs:495 /
        # VerifyCSPCensusProofs:517) — both gadgets run uniformly, the
        # final equalities masked by (real AND matching-origin)
        if params.include_census:
            with cs.scope(f"census-{i}"):
                L = params.census_levels
                cp = (
                    w.census_proofs[i]
                    if real and w.census_proofs is not None
                    else None
                )
                mk = cp if cp and cp["kind"] == "merkle" else None
                sibs = [
                    cs.priv_input(x)
                    for x in (mk["siblings"] if mk else [0] * L)
                ]
                acts = [
                    cs.priv_input(x)
                    for x in (mk["actives"] if mk else [0] * L)
                ]
                bits = [
                    cs.priv_input(x)
                    for x in (mk["index_bits"] if mk else [0] * L)
                ]
                for b in bits:
                    cs.assert_bool(b)
                en_mk = cs.mul(m, is_mk)
                leaf = pack_census_leaf_gadget(cs, addr, weight)
                leanimt_verify(cs, census_root, leaf, bits, sibs, acts, en_mk)
                idx_val = cs.from_bits(bits)
                cs.assert_eq(
                    cs.mul(
                        en_mk,
                        bidx - (idx_val + cs.constant(protocol.BALLOT_MIN)),
                    ),
                    cs.constant(0),
                )

                cpp = cp if cp and cp["kind"] == "csp" else None
                pub = (
                    cs.priv_input(cpp["public"][0] if cpp else 0),
                    cs.priv_input(cpp["public"][1] if cpp else 1),
                )
                r8 = (
                    cs.priv_input(cpp["r8"][0] if cpp else 0),
                    cs.priv_input(cpp["r8"][1] if cpp else 1),
                )
                s_val = cs.priv_input(cpp["s"] if cpp else 0)
                vidx = cs.priv_input(cpp["voter_index"] if cpp else 0)
                vb = G.to_bits_canonical(
                    cs, vidx, protocol.VOTER_INDEX_MAX.bit_length()
                )
                G.assert_bits_lt_const(cs, vb, protocol.VOTER_INDEX_MAX + 1)
                en_csp = cs.mul(m, is_csp)
                msg = cs.poseidon([vidx, pid, addr, weight])
                csp_eddsa_verify(cs, census_root, msg, pub, r8, s_val, en_csp)
                cs.assert_eq(
                    cs.mul(
                        en_csp,
                        bidx - (vidx + cs.constant(protocol.BALLOT_MIN)),
                    ),
                    cs.constant(0),
                )

    # results transition + tally equality
    rt = batch.results_transition
    r_inputs = apply_transition(rt, "results")
    cs.assert_eq(roots[-1], root_after)
    with cs.scope("tally"):
        old_res = [cs.priv_input(c) for c in batch.old_results.coords()]
        new_res = [cs.priv_input(c) for c in batch.new_results.coords()]
        old_val = G.multi_poseidon_gadget(cs, old_res)
        new_val = G.multi_poseidon_gadget(cs, new_res)
        cs.assert_eq(old_val, r_inputs["old_value"])
        cs.assert_eq(new_val, r_inputs["value"])
        # new = old + reenc_sum - over_sum, per ciphertext point
        for j in range(params.n_fields):
            for pt in range(2):  # c1, c2
                o = (
                    old_res[4 * j + 2 * pt],
                    old_res[4 * j + 2 * pt + 1],
                )
                a = G.te_add(
                    cs,
                    o,
                    (
                        reenc_sum[4 * j + 2 * pt],
                        reenc_sum[4 * j + 2 * pt + 1],
                    ),
                )
                ns = G.te_add(
                    cs,
                    a,
                    _te_neg(
                        cs,
                        (
                            over_sum[4 * j + 2 * pt],
                            over_sum[4 * j + 2 * pt + 1],
                        ),
                    ),
                )
                cs.assert_eq(ns[0], new_res[4 * j + 2 * pt])
                cs.assert_eq(ns[1], new_res[4 * j + 2 * pt + 1])

    # -- batch hash binding (the aggregator's public input) ------------------
    with cs.scope("batch-hash"):
        count = cs.constant(0)
        for m in mask:
            count = count + m
        count_bits = cs.to_bits(count, 8)
        msg = _value_bits_to_bytes(cs, count_bits, 1)
        for bits in vote_hash_bits_all:
            msg += _value_bits_to_bytes(cs, bits, 32)
        digest = keccak256_bits(cs, msg)
        bound = _bytes_bits_to_value(cs, digest[: 31 * 8])
        cs.assert_eq(bound, batch_hash_pub)

    # -- aggregator proof (emulated BW6-761) ---------------------------------
    if params.verify_aggregator:
        with cs.scope("aggregator-proof"):
            from davinci_tpu.circuits.pairing_gadget6 import (
                Groth16VerifierGadgetBW6,
            )

            gadget = Groth16VerifierGadgetBW6(cs, params.agg_vk)
            pv = gadget.alloc_proof(w.agg_proof)
            # the aggregator's single public input IS our batch hash
            bh_bits = cs.to_bits(batch_hash_pub, 31 * 8)
            gadget.assert_valid(pv, [bh_bits])

    return cs


# -- helpers -----------------------------------------------------------------


def _assert_inclusion(cs, params, root, proof, key: int, values: list):
    """Bind a config leaf under `root` via the inclusion gadget."""
    leaf_v = (
        values[0]
        if len(values) == 1
        else G.smt_encode_leaf_value(cs, values)
    )
    kk = cs.constant(key)
    lh = G.smt_leaf_hash(cs, kk, leaf_v)
    G.smt_verify_inclusion(
        cs,
        root,
        [cs.priv_input(x) for x in proof.padded_siblings(params.n_levels)],
        kk,
        lh,
        params.n_levels,
    )


def _acc_ballot(cs, params, acc, coords, m):
    """Masked accumulation of a ballot's TE points into the running sum."""
    if acc is None:
        return [cs.mul(m, c) for c in coords]
    out = []
    for j in range(params.n_fields * 2):
        pt = (coords[2 * j], coords[2 * j + 1])
        cur = (acc[2 * j], acc[2 * j + 1])
        added = G.te_add(cs, cur, pt)
        out.append(cs.select(m, added[0], cur[0]))
        out.append(cs.select(m, added[1], cur[1]))
    return out


def _te_neg(cs, pt):
    """BabyJubJub (RTE) negation: (x, y) -> (-x, y)."""
    return (-pt[0], pt[1])


def _is_zero_ballot(cs, coords):
    """Boolean: all ciphertexts are the identity (0, 1) pairs."""
    acc = cs.one
    for j in range(0, len(coords), 2):
        zx = cs.is_zero(coords[j])
        oy = cs.is_zero(coords[j + 1] - cs.one)
        acc = cs.mul(acc, cs.mul(zx, oy))
    return acc


def _value_bits_to_bytes(cs, bits, nbytes: int):
    zero = cs.constant(0)
    padded = (list(bits) + [zero] * (nbytes * 8))[: nbytes * 8]
    out = []
    for j in range(nbytes):
        out.extend(padded[8 * (nbytes - 1 - j) : 8 * (nbytes - j)])
    return out


def _bytes_bits_to_value(cs, msg_bits):
    nbytes = len(msg_bits) // 8
    acc = cs.constant(0)
    wgt = 0
    for j in reversed(range(nbytes)):
        for i in range(8):
            acc = acc + cs.coerce(msg_bits[8 * j + i]) * (1 << wgt)
            wgt += 1
    return acc
