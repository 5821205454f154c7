#!/usr/bin/env python3
"""Microbenchmark: layout variants for the MSM sorted-point-stream gather.

The kernel MSM's dominant cost (BENCH_NOTES) is materializing the
per-window sorted point stream: gather 22*2^18 random rows of 17 int32
from a (2^18, 17) packed array, laid out as (rows, LP, nl) for the scan
kernel.  This probes alternatives on the real chip.

Run: PYTHONPATH=/root/repo python scripts/gather_probe.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    W, LP, COLS = 22, 17, 2048
    rows = n // COLS
    nl = W * COLS
    rng = np.random.default_rng(0)
    packed = jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(n, LP), dtype=np.int64).astype(
            np.int32
        )
    )
    order = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(W)]).astype(np.int32)
    )  # (W, n)

    # roofline: stream copy of the gathered volume (W*n rows of LP int32)
    vol_mb = W * n * LP * 4 / 1e6
    big = jnp.tile(packed, (W, 1))

    @jax.jit
    def copy(x):
        return x + 1

    bench(f"stream add ({vol_mb:.0f} MB rw)", copy, big)

    # v0: current composite — gather (W, n, LP) then permute to (rows, LP, nl)
    @jax.jit
    def v0(packed, order):
        s = packed[order]  # (W, n, LP)
        return (
            s.reshape(W, COLS, rows, LP).transpose(2, 3, 0, 1).reshape(rows, LP, nl)
        )

    r0 = bench("v0 gather+permute (current)", v0, packed, order)

    # v4: pre-arranged indices -> gather lands (rows, nl, LP); minor transpose
    order_np = np.asarray(order)
    order2 = np.moveaxis(order_np.reshape(W, COLS, rows), 2, 0).reshape(rows, nl)
    order2 = jnp.asarray(order2.astype(np.int32))

    @jax.jit
    def v4(packed, order2):
        s = packed[order2]  # (rows, nl, LP)
        return jnp.swapaxes(s, 1, 2)  # (rows, LP, nl)

    r4 = bench("v4 direct gather + minor transpose", v4, packed, order2)
    assert np.array_equal(np.asarray(r0), np.asarray(r4)), "v4 mismatch"

    # v4b: gather only, no transpose (what a kernel-side transpose would see)
    @jax.jit
    def v4b(packed, order2):
        return packed[order2]

    bench("v4b direct gather only", v4b, packed, order2)

    # v5: flat element gather (rows*nl*LP element indices)
    flat_idx = (order2[..., None] * LP + jnp.arange(LP)[None, None, :]).reshape(-1)

    @jax.jit
    def v5(packed, flat_idx):
        return packed.reshape(-1)[flat_idx].reshape(rows, nl, LP)

    bench("v5 flat element gather", v5, packed, flat_idx)

    # v6: scatter construction (inverse permutation, write-random)
    inv = np.empty_like(order_np)
    for w in range(W):
        inv[w, order_np[w]] = np.arange(n, dtype=np.int32)
    inv2 = jnp.asarray(inv)  # (W, n): dst position of source row i

    @jax.jit
    def v6(packed, inv2):
        out = jnp.zeros((W, n, LP), jnp.int32)
        src = jnp.broadcast_to(packed[None], (W, n, LP))
        return out.at[jnp.arange(W)[:, None], inv2].set(src)

    bench("v6 scatter (W,n,LP)", v6, packed, inv2)

    # v7: gather with padded source rows (LP -> 24, 8-aligned)
    packed24 = jnp.pad(packed, ((0, 0), (0, 24 - LP)))

    @jax.jit
    def v7(packed24, order2):
        s = packed24[order2]
        return jnp.swapaxes(s, 1, 2)

    bench("v7 gather rows padded to 24", v7, packed24, order2)

    # v8: two half-width gathers (rows of 8+9) — does row size matter?
    pa, pb = packed[:, :8], packed[:, 8:]

    @jax.jit
    def v8(pa, pb, order2):
        return pa[order2], pb[order2]

    bench("v8 split 8/9 gathers", v8, pa, pb, order2)

    # v9: take_along_axis formulation on (n, LP) with (rows*nl, 1) idx
    @jax.jit
    def v9(packed, order2):
        idx = order2.reshape(-1, 1)
        return jnp.take_along_axis(
            packed[None].repeat(1, axis=0)[0], idx, axis=0
        ).reshape(rows, nl, LP)

    bench("v9 take_along_axis", v9, packed, order2)


if __name__ == "__main__":
    main()
