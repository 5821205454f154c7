#!/usr/bin/env python3
"""Micro-benchmark: fused point-add kernel throughput (adds/s) on the
current backend.  Usage: python scripts/bench_add_kernel.py [n] [variant]

The MSM bucket pipeline is add-kernel-bound (BENCH_NOTES.md), so this is
the inner-loop number that sets the headline MSM rate.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from davinci_tpu import curves as C
    from davinci_tpu.ec import get_device_curve

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22 * 2048
    spec = C.bn254_g1
    dc = get_device_curve(spec)

    rng = np.random.default_rng(0)
    pts = [spec.gen.mul(int(k)) for k in rng.integers(1, 2**31, size=64)]
    P = dc.encode_points(pts)
    reps = n // 64
    a = tuple(jnp.tile(x, (reps, 1)) for x in P)
    b = tuple(jnp.roll(jnp.tile(x, (reps, 1)), 7, axis=0) for x in P)

    out = dc.add(a, b)
    jax.block_until_ready(out)
    # correctness spot check on one lane
    got = dc.decode_points(tuple(x[:1] for x in out))[0]
    want = pts[0].add(pts[64 - 7])
    assert got == want, (got, want)

    iters = 30
    t0 = time.time()
    for _ in range(iters):
        out = dc.add(out, b)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"n={n}  {n / dt / 1e6:.3f}M adds/s  {dt * 1e3:.3f} ms/op")


if __name__ == "__main__":
    main()
