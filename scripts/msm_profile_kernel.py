#!/usr/bin/env python3
"""Stage-by-stage timing of the KERNEL MSM path (bucket_kernel) on TPU.

Splits bucket_accumulate_kernel into its XLA prologue (pack + sort +
layout), the Pallas scan, and the tail-gather epilogue, then times the
leftover merge, the reduce kernel, the cross-lane combine, and Horner.

Run: PYTHONPATH=/root/repo python scripts/msm_profile_kernel.py [n]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import pippenger as pp
from davinci_tpu.msm import bucket_kernel as bk


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
    L = dc.df.L
    rng = np.random.default_rng(42)
    base_pts = [spec.gen.mul(int(k)) for k in rng.integers(1, 2**31, size=64)]
    P64 = dc.encode_points(base_pts)
    reps = n // 64
    xs = jnp.tile(P64[0], (reps, 1))
    ys = jnp.tile(P64[1], (reps, 1))
    zs = jnp.tile(P64[2], (reps, 1))
    W = -(-spec.r.bit_length() // pp.WINDOW_BITS)
    S = jnp.asarray(rng.integers(0, pp.NBUCKETS, size=(n, W), dtype=np.int32))
    keys_all = S.T  # (W, n)
    Wt = W
    cols = pp.COLS
    rows = n // cols
    nl = Wt * cols
    LP = (12 * L + 15) // 16
    NB = pp.NBUCKETS

    @jax.jit
    def prologue(xs, ys, zs, keys_all):
        is_inf = jnp.all(zs == 0, axis=-1)
        ka = jnp.where(is_inf[None, :], NB, keys_all)

        def pack16(a):
            planes = []
            for j in range(LP):
                bit = 16 * j
                q, s = bit // 12, bit % 12
                v = a[:, q] >> s
                if q + 1 < L:
                    v = v | (a[:, q + 1] << (12 - s))
                planes.append(v & 0xFFFF)
            return jnp.stack(planes, axis=1)

        packed = jnp.bitwise_or(pack16(xs), jnp.left_shift(pack16(ys), 16))
        order = jnp.argsort(ka, axis=1)
        k = jnp.take_along_axis(ka, order, axis=1)
        sorted_p = packed[order]
        pts_arr = (
            sorted_p.reshape(Wt, cols, rows, LP)
            .transpose(2, 3, 0, 1)
            .reshape(rows, LP, nl)
        )
        keys_arr = k.reshape(Wt, cols, rows).transpose(2, 0, 1).reshape(rows, nl)
        return pts_arr, keys_arr, k

    @jax.jit
    def sort_only(ka):
        return jnp.argsort(ka, axis=1)

    @jax.jit
    def sort_gather(xs, ys, zs, keys_all):
        is_inf = jnp.all(zs == 0, axis=-1)
        ka = jnp.where(is_inf[None, :], NB, keys_all)

        def pack16(a):
            planes = []
            for j in range(LP):
                bit = 16 * j
                q, s = bit // 12, bit % 12
                v = a[:, q] >> s
                if q + 1 < L:
                    v = v | (a[:, q + 1] << (12 - s))
                planes.append(v & 0xFFFF)
            return jnp.stack(planes, axis=1)

        packed = jnp.bitwise_or(pack16(xs), jnp.left_shift(pack16(ys), 16))
        order = jnp.argsort(ka, axis=1)
        return packed[order]

    scan = jax.jit(lambda p, k: bk._bucket_scan_jit(dc, p, k))

    @jax.jit
    def epilogue(acc_stream, k, keys_arr):
        w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]
        b_iota = jnp.arange(NB, dtype=jnp.int32)
        ends = jax.vmap(
            lambda kk: jnp.searchsorted(kk, b_iota, side="right")
        )(k).astype(jnp.int32)
        starts = jax.vmap(
            lambda kk: jnp.searchsorted(kk, b_iota, side="left")
        )(k).astype(jnp.int32)
        use = (ends > starts) & (ends % rows != 0)
        last = jnp.maximum(ends - 1, 0)
        row_idx = last % rows
        lane_idx = w_iota * cols + last // rows
        flat_rows = acc_stream.reshape(rows * nl, 3 * L)
        vals = flat_rows[(row_idx * nl + lane_idx).reshape(-1)].reshape(
            Wt, NB, 3 * L
        )
        vals_t = jnp.moveaxis(vals, 2, 0)
        one = dc.ops.one_mont.astype(jnp.int32)
        ident_t = jnp.concatenate(
            [jnp.zeros((L,), jnp.int32), one, jnp.zeros((L,), jnp.int32)]
        )[:, None, None]
        vals_t = jnp.where(use[None], vals_t, ident_t)
        pad = jnp.broadcast_to(ident_t, (3 * L, Wt, 2))
        buckets_cat = jnp.concatenate([vals_t, pad], axis=2)
        buckets = tuple(buckets_cat[c * L : (c + 1) * L] for c in range(3))
        fin = acc_stream[rows - 1].T.reshape(3 * L, Wt, cols)
        acc = tuple(fin[c * L : (c + 1) * L] for c in range(3))
        acc_key = keys_arr[rows - 1].reshape(Wt, cols)
        return buckets, acc, acc_key

    merge = jax.jit(lambda b, a, k: pp._merge_leftovers_t(dc, b, a, k))
    reduce_kern = jax.jit(
        lambda b: bk._bucket_reduce_kernel_jit(
            dc, tuple(x[:, :, :NB] for x in b)
        )
    )
    combine = jax.jit(lambda A, B: pp._reduce_combine_t(dc, A, B))
    horner = functools.partial(pp._horner_dispatch, dc)

    bench("argsort only", sort_only, keys_all)
    bench("sort+pack+gather", sort_gather, xs, ys, zs, keys_all)
    pts_arr, keys_arr, k = bench("prologue(all)", prologue, xs, ys, zs, keys_all)
    acc_stream = bench("scan kernel", scan, pts_arr, keys_arr)
    buckets, acc, acc_key = bench("epilogue(tails)", epilogue, acc_stream, k, keys_arr)
    buckets = bench("merge_leftovers", merge, buckets, acc, acc_key)
    A, B = bench("reduce kernel", reduce_kern, buckets)
    sums = bench("reduce combine", combine, A, B)
    bench("horner", lambda s: horner(s, W), sums)
    bench("FULL msm", lambda: pp.msm(dc, (xs, ys, zs), S), iters=3)


if __name__ == "__main__":
    main()
