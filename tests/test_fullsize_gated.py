"""Full-size (production-parameter) circuit builds — env-gated: these are
multi-million to tens-of-millions of constraints (see BENCH_NOTES.md on
the emulated-arithmetic cost gap) and take minutes + many GB.

RUN_HEAVY_CIRCUITS=1 python -m pytest tests/test_fullsize_gated.py -x -q -s
"""

import os
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_HEAVY_CIRCUITS"),
    reason="full-size circuit builds are gated (RUN_HEAVY_CIRCUITS=1)",
)


def test_full_vote_verifier_bn254_secp256k1():
    """Circuit 2 at production parameters: a REAL BN254 ballot proof
    verified in-circuit over BLS12-377 (emulated pairing), full secp256k1
    ECDSA + keccak address binding.  Build + satisfiability."""
    import random

    from davinci_tpu import curves as C
    from davinci_tpu import fields as F
    from davinci_tpu.ballotmode import BallotMode
    from davinci_tpu.circuits.ballotproof import (
        build_ballot_proof_circuit,
        make_ballot,
    )
    from davinci_tpu.circuits.voteverifier import (
        VoteVerifierParams,
        build_vote_verifier_circuit,
        make_vote_verifier_witness,
    )
    from davinci_tpu.ethereum import sign_eth_prefixed
    from davinci_tpu.groth16 import Groth16
    from davinci_tpu.pairing import bn254_pairing

    rng = random.Random(0xF2)

    # real circuit-1 proof
    t0 = time.time()
    g16 = Groth16("bn254")
    bm = BallotMode()
    from davinci_tpu.elgamal import generate_key

    pub, _ = generate_key(rng)
    bw = make_ballot(
        12345, bm, (pub.x, pub.y), rng.randrange(2**160),
        rng.randrange(1, 2**200), [1, 0, 0, 0, 0, 0, 0, 0],
    )
    cs1 = build_ballot_proof_circuit(bw)
    pk1, vk1 = g16.setup(cs1)
    proof1 = g16.prove(pk1, cs1)
    ih = bw.inputs_hash()
    assert g16.verify(vk1, proof1, [ih])
    print(f"\ncircuit-1 prove: {time.time()-t0:.0f}s")

    params = VoteVerifierParams(
        inner_ctx=bn254_pairing,
        inner_vk=vk1,
        sig_spec=C.secp256k1,
    )
    priv = rng.randrange(1, C.secp256k1.r)

    def eth_sign(d, e_int):
        from davinci_tpu.ethereum import sign

        r, s, _ = sign(d, e_int.to_bytes(32, "big"))
        return r, s

    w = make_vote_verifier_witness(
        params,
        process_id=12345,
        priv_sig_key=priv,
        inputs_hash=ih,
        ballot_proof=proof1,
        vote_id=bw.vote_id,
        sign_fn=eth_sign,
    )
    t0 = time.time()
    cs2 = build_vote_verifier_circuit(params, w)
    n = len(cs2.constraints)
    print(f"circuit-2 FULL build: {n:,} constraints in {time.time()-t0:.0f}s")
    t0 = time.time()
    assert cs2.check_satisfied(), cs2.first_unsatisfied()
    print(f"satisfiability: {time.time()-t0:.0f}s")
