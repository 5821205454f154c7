#!/usr/bin/env python3
"""Per-MSM timing inside the c1 prove (TPU): which of the five PK MSMs
eats the groth16.msms phase, and what one 2^18 G1/G2 MSM costs."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from davinci_tpu.ballotmode import BallotMode
from davinci_tpu.circuits.artifacts import ArtifactStore
from davinci_tpu.circuits.ballotproof import build_ballot_proof_circuit, make_ballot
from davinci_tpu.elgamal import generate_key
from davinci_tpu.msm.pippenger import scalars_to_limbs

import numpy as np


def main():
    rng = random.Random(0xF3)
    store = ArtifactStore(os.environ.get("DAVINCI_ARTIFACTS_DIR", "/tmp/dvt-full"))
    bm = BallotMode()
    pub, _ = generate_key(rng)
    bw = make_ballot(
        12345, bm, (pub.x, pub.y), rng.randrange(2**160),
        rng.randrange(1, 2**200), [1, 0, 0, 0, 0, 0, 0, 0],
    )
    cs1 = build_ballot_proof_circuit(bw)
    rt1 = store.load_or_setup("ballotproof-full", "bn254", cs1)
    g16, pk = rt1.g16, rt1.pk
    z = cs1.witness()

    t = time.time()
    Z = scalars_to_limbs(g16.g1, z)
    print(f"scalars_to_limbs({len(z)}): {time.time()-t:.3f}s")

    sets = [
        ("a_g1", g16.dc, g16.g1, pk.a_g1, Z[pk.a_indices]),
        ("b_g1", g16.dc, g16.g1, pk.b_g1, Z[pk.b_indices]),
        ("k_g1", g16.dc, g16.g1, pk.k_g1,
         Z[np.asarray(pk.k_priv_indices, np.int64)]),
        ("z_g1", g16.dc, g16.g1, pk.z_g1,
         np.tile(Z, (2, 1))[: len(pk.z_g1)]),  # stand-in, right shape
        ("b_g2", g16.dc2, g16.g2, pk.b_g2, Z[pk.b_indices]),
    ]
    import jax
    import jax.numpy as jnp
    from davinci_tpu.msm import msm as msm_fn

    for rep in range(2):
        for name, dc, gs, bases, S in sets:
            t = time.time()
            g16._msm_enc(dc, gs, bases, S)
            print(f"[rep{rep}] {name} n={len(bases)}: {time.time()-t:.3f}s",
                  flush=True)
    # upload vs kernel split at the fixed 2^18 shape (G1)
    seg = g16.MSM_SEGMENT
    S = np.pad(Z[pk.b_indices], ((0, seg - len(pk.b_indices)), (0, 0)))
    for rep in range(3):
        t = time.time()
        Sd = jnp.asarray(S)
        Sd.block_until_ready()
        t_up = time.time() - t
        arrs = pk.b_g1.device_padded(seg)
        t = time.time()
        out = msm_fn(g16.dc, arrs, Sd)
        jax.block_until_ready(out)
        t_k = time.time() - t
        t = time.time()
        g16.dc.decode_points(tuple(a[None] for a in out))
        t_dec = time.time() - t
        print(f"[split rep{rep}] upload {t_up:.3f}s kernel {t_k:.3f}s "
              f"decode {t_dec:.3f}s", flush=True)


if __name__ == "__main__":
    main()
