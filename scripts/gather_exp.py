#!/usr/bin/env python3
"""Measure the MSM point-gather cost and variants.

The pipeline gathers sorted point rows per window: (Wt, n) indices into an
(n, 66) int32 array (264B rows).  Variants:
  rowcat  -- production: one gather of the concatenated (n, 66) rows
  three   -- three separate (n, 22) gathers
  packed  -- gather (n, 33) rows of 2x12-bit packed limbs + unpack
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    W = 22
    L = 22
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        rng.integers(0, 1 << 12, size=(n, 3 * L), dtype=np.int32)
    )
    order = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32)
    )

    @jax.jit
    def rowcat(d, o):
        return d[o]

    @jax.jit
    def three(d, o):
        a = d[:, :L][o]
        b = d[:, L : 2 * L][o]
        c = d[:, 2 * L :][o]
        return a, b, c

    @jax.jit
    def packed(d, o):
        dp = d[:, 0::2] | (d[:, 1::2] << 12)  # (n, 33)
        g = dp[o]  # (W, n, 33)
        lo = g & 0xFFF
        hi = (g >> 12) & 0xFFF
        return lo, hi

    @jax.jit
    def take_axis(d, o):
        return jnp.take(d, o, axis=0)

    bench("rowcat", rowcat, data, order)
    bench("three", three, data, order)
    bench("packed", packed, data, order)
    bench("take_axis", take_axis, data, order)


if __name__ == "__main__":
    main()
