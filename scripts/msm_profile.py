#!/usr/bin/env python3
"""Stage-by-stage timing of the MSM bucket pipeline on the current backend."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import pippenger as pp


def bench(name, fn, *args, iters=5):
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
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    rng = np.random.default_rng(42)
    base_pts = [spec.gen.mul(int(k)) for k in rng.integers(1, 2**31, size=64)]
    P64 = dc.encode_points(base_pts)
    reps = n // 64
    xs = jnp.tile(P64[0], (reps, 1))
    ys = jnp.tile(P64[1], (reps, 1))
    zs = jnp.tile(P64[2], (reps, 1))
    W = -(-spec.r.bit_length() // pp.WINDOW_BITS)
    S = jnp.asarray(rng.integers(0, pp.NBUCKETS, size=(n, W), dtype=np.int32))
    keys_all = S.T

    @jax.jit
    def sort_only(k):
        return jnp.argsort(k, axis=1)

    @jax.jit
    def gather_layout(xs, ys, zs, keys_all):
        order = jnp.argsort(keys_all, axis=1)
        k = jnp.take_along_axis(keys_all, order, axis=1)
        pts_cat = jnp.concatenate([xs, ys, zs], axis=-1)
        sorted_cat = pts_cat[order]
        third = xs.shape[-1]
        Wt = keys_all.shape[0]
        rows = keys_all.shape[1] // pp.COLS
        trailing = xs.shape[1:]
        pts = (
            sorted_cat[..., :third],
            sorted_cat[..., third : 2 * third],
            sorted_cat[..., 2 * third :],
        )
        k2 = jnp.moveaxis(k.reshape(Wt, pp.COLS, rows), 2, 0)
        p2 = tuple(
            jnp.moveaxis(a.reshape((Wt, pp.COLS, rows) + trailing), 2, 0)
            for a in pts
        )
        return k2, p2

    accum = jax.jit(lambda x, y, z, k: pp._bucket_accumulate_fused(dc, x, y, z, k))
    reduce_ = jax.jit(lambda b: pp._bucket_reduce_fused(dc, b))

    bench("argsort", sort_only, keys_all)
    bench("gather+layout", gather_layout, xs, ys, zs, keys_all)
    buckets = bench("accumulate(total)", accum, xs, ys, zs, keys_all)
    sums = bench("bucket_reduce", reduce_, buckets)
    bench("horner", lambda s: pp._horner_jit(dc, s, W), sums)
    bench("full msm", lambda: pp.msm(dc, (xs, ys, zs), S), iters=3)


if __name__ == "__main__":
    main()
