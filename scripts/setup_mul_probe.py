#!/usr/bin/env python3
"""Per-stage timing of Groth16 setup's fixed-base batch muls on TPU:
table build, window mul, affine normalization, host transfer."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.groth16.core import _fixed_base_mul_affine, _fixed_base_table
from davinci_tpu.msm.pippenger import scalars_to_limbs


def probe(name, gspec, chunk):
    dc = get_device_curve(gspec)
    rng = random.Random(5)
    t = time.time()
    table = _fixed_base_table(dc, gspec)
    jax.block_until_ready(table)
    print(f"{name}: table build {time.time()-t:.2f}s", flush=True)
    scalars = [rng.randrange(gspec.r) for _ in range(chunk)]
    for rep in range(3):
        t = time.time()
        S = jnp.asarray(scalars_to_limbs(gspec, scalars))
        S.block_until_ready()
        t_s = time.time() - t
        t = time.time()
        res = _fixed_base_mul_affine(dc, *table, S)
        jax.block_until_ready(res)
        t_m = time.time() - t
        t = time.time()
        host = tuple(np.asarray(a) for a in res)
        t_h = time.time() - t
        print(
            f"{name} rep{rep} chunk={chunk}: scal {t_s:.2f}s mul+affine"
            f" {t_m:.2f}s to_host {t_h:.2f}s"
            f" -> {1e3*(t_s+t_m+t_h)/chunk:.3f} ms/pt",
            flush=True,
        )


if __name__ == "__main__":
    probe("bls377_g1", C.bls377_g1, 65536)
    probe("bls377_g2", C.bls377_g2, 16384)
    probe("bn254_g1", C.bn254_g1, 65536)
