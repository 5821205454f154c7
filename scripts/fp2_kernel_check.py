#!/usr/bin/env python3
"""Fp2 pallas point-add kernel vs host oracle on the real TPU, then a
2^16 G2 MSM timing (the b2 proving-key MSM cost driver)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve


def check(gname, gspec):
    dc = get_device_curve(gspec)
    rng = random.Random(7)
    pts1 = [gspec.gen.mul(rng.randrange(2, 1 << 40)) for _ in range(6)]
    pts2 = [gspec.gen.mul(rng.randrange(2, 1 << 40)) for _ in range(6)]
    pts1 += [gspec.infinity(), gspec.gen.mul(9), gspec.gen.mul(11)]
    pts2 += [gspec.gen.mul(5), gspec.gen.mul(9), gspec.gen.mul(11).neg()]
    P = dc.encode_points(pts1)
    Q = dc.encode_points(pts2)
    t = time.time()
    got = dc.decode_points(dc.add(P, Q))
    print(f"{gname}: add+decode {time.time()-t:.1f}s")
    for a, b, g in zip(pts1, pts2, got):
        w = a.add(b)
        assert g == w, (gname, a, b)
    print(f"{gname}: fp2 pallas kernel matches host oracle")


def msm_timing(gspec, n=1 << 16):
    import jax
    import jax.numpy as jnp

    from davinci_tpu.msm import msm
    from davinci_tpu.msm.pippenger import scalars_to_limbs

    dc = get_device_curve(gspec)
    rng = random.Random(11)
    base = [gspec.gen.mul(rng.randrange(2, 1 << 30)) for _ in range(64)]
    P = dc.encode_points(base * (n // 64))
    S = np.asarray(
        scalars_to_limbs(gspec, [rng.randrange(gspec.r) for _ in range(n)])
    )
    Sd = jnp.asarray(S)
    for rep in range(3):
        t = time.time()
        out = msm(dc, P, Sd)
        jax.block_until_ready(out)
        print(f"G2 MSM n={n} rep{rep}: {time.time()-t:.2f}s", flush=True)


if __name__ == "__main__":
    check("bn254_g2", C.bn254_g2)
    check("bls12_377_g2", C.bls377_g2)
    msm_timing(C.bls377_g2)
