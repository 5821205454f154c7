"""Monolithic Pallas TPU kernel for Pippenger bucket accumulation.

Replaces the lax.scan + per-step scatter composition in pippenger.py
(`_bucket_accumulate_fused`) on the TPU path.  Motivation (measured on
real TPU at n=2^18, BN254): the scan spends ~3.5 ms/step of which only
~1.7 ms is the fused point-add kernel — the rest is XLA select/scatter
round trips and the per-call (N, L) <-> (L, N) transposes inside
ec/pallas_add.point_add.  This kernel keeps the running accumulator in
VMEM scratch across sequential grid steps (TPU grids execute in order on
one core), fuses the same-key compare + select into the addition, and
writes the running accumulator stream to HBM.

Buckets are then built by GATHER instead of scatter: after sorting, each
bucket's points form one contiguous run, so the position of each bucket's
within-lane tail sum is computable from the sorted keys alone (a cumsum
of per-bucket counts).  Only ~NBUCKETS of the n stream positions per
window are touched — versus scattering all n emissions.

Run-splitting invariants (same as the scan design in pippenger.py):
a sorted run [s0, s1) laid out column-major over (COLS lanes) x (rows)
splits into at most one mid-lane tail piece (gathered here from the acc
stream at position s1-1, iff s1 % rows != 0) plus lane-final pieces that
the caller's leftover suffix-sum merge folds in.

Role parity: gnark-crypto Pippenger bucket accumulation / ICICLE CUDA MSM
(reference prover/prover_gpu.go, SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from davinci_tpu.ec.pallas_add import _make_field_ops, _rcb15


def _scan_kernel(p_ref, np_ref, b3_ref, keys_ref, pts_ref, out_ref,
                 acc_ref, key_ref):
    L = p_ref.shape[0]
    r = pl.program_id(1)
    key = keys_ref[0, 0, :]
    P2 = tuple(
        [pts_ref[0, c * L + i, :] for i in range(L)] for c in range(3)
    )

    @pl.when(r == 0)
    def _init():
        for c in range(3):
            for i in range(L):
                out_ref[0, c * L + i, :] = P2[c][i]
                acc_ref[c * L + i, :] = P2[c][i]
        key_ref[0, :] = key

    @pl.when(r > 0)
    def _step():
        p_cols = [p_ref[i, 0] for i in range(L)]
        np_cols = [np_ref[i, 0] for i in range(L)]
        b3 = [b3_ref[i, 0] for i in range(L)]
        mul, add, sub = _make_field_ops(p_cols, np_cols, L)
        P1 = tuple(
            [acc_ref[c * L + i, :] for i in range(L)] for c in range(3)
        )
        merged = _rcb15(mul, add, sub, b3, P1, P2)
        same = key == key_ref[0, :]
        for c in range(3):
            for i in range(L):
                v = jnp.where(same, merged[c][i], P2[c][i])
                out_ref[0, c * L + i, :] = v
                acc_ref[c * L + i, :] = v
        key_ref[0, :] = key


def _lane_tile(nl: int) -> int:
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if nl % cand == 0:
            return cand
    return nl


def _bucket_scan(curve, pts_arr, keys_arr, interpret=False):
    if interpret:
        # eager interpret mode (tests): jitting the interpreted grid is
        # pathological on XLA:CPU
        return _bucket_scan_impl(curve, pts_arr, keys_arr, True)
    return _bucket_scan_jit(curve, pts_arr, keys_arr)


@functools.partial(jax.jit, static_argnums=0)
def _bucket_scan_jit(curve, pts_arr, keys_arr):
    return _bucket_scan_impl(curve, pts_arr, keys_arr, False)


def _bucket_scan_impl(curve, pts_arr, keys_arr, interpret):
    """pts_arr: (rows, 3L, NL) sorted column-major points; keys_arr:
    (rows, NL) sorted bucket keys.  Returns the running accumulator
    stream, same shape as pts_arr."""
    df = curve.df
    L = df.L
    rows, threeL, nl = pts_arr.shape
    lt = _lane_tile(nl)
    grid = (nl // lt, rows)
    const_spec = pl.BlockSpec(
        (L, 1), lambda t, r: (0, 0), memory_space=pltpu.VMEM
    )
    # keys ride with a singleton sublane axis: Mosaic requires the last two
    # block dims divisible by (8, 128) or equal to the array dims, and
    # `rows` is small (n/COLS) — (1, 1, lt) over (rows, 1, nl) satisfies it
    keys_spec = pl.BlockSpec(
        (1, 1, lt), lambda t, r: (r, 0, t), memory_space=pltpu.VMEM
    )
    pts_spec = pl.BlockSpec(
        (1, threeL, lt), lambda t, r: (r, 0, t), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, threeL, nl), jnp.int32),
        grid=grid,
        in_specs=[const_spec] * 3 + [keys_spec, pts_spec],
        out_specs=pts_spec,
        scratch_shapes=[
            pltpu.VMEM((threeL, lt), jnp.int32),
            pltpu.VMEM((1, lt), jnp.int32),
        ],
        interpret=interpret,
    )(
        df.p_limbs[:, None], df.nprime_limbs[:, None], curve.b3[:, None],
        keys_arr[:, None, :], pts_arr,
    )


def bucket_accumulate_kernel(
    curve, xs, ys, zs, keys_all, cols: int, nbuckets: int,
    interpret: bool = False,
):
    """Bucket sums for a tile of windows via the monolithic scan kernel.

    xs/ys/zs: (n, L) point coords; keys_all: (Wt, n) bucket indices
    (padding rides as key == nbuckets).  Returns bucket arrays
    (Wt, nbuckets+2, L) x3 — same contract as
    pippenger._bucket_accumulate_fused (slot nbuckets = padding sink,
    nbuckets+1 = scratch), with lane-final leftovers ALREADY merged by
    the caller-shared suffix-sum (we return buckets + leftover state).
    """
    Wt, n = keys_all.shape
    L = xs.shape[-1]
    assert n % cols == 0
    rows = n // cols
    nl = Wt * cols

    order = jnp.argsort(keys_all, axis=1)  # (Wt, n)
    k = jnp.take_along_axis(keys_all, order, axis=1)
    pts_cat = jnp.concatenate([xs, ys, zs], axis=-1)  # (n, 3L)
    sorted_cat = pts_cat[order]  # (Wt, n, 3L)

    # column-major lanes: sorted position s -> (lane s//rows, row s%rows)
    pts_arr = (
        sorted_cat.reshape(Wt, cols, rows, 3 * L)
        .transpose(2, 3, 0, 1)
        .reshape(rows, 3 * L, nl)
    )
    keys_arr = (
        k.reshape(Wt, cols, rows).transpose(2, 0, 1).reshape(rows, nl)
    )

    acc_stream = _bucket_scan(curve, pts_arr, keys_arr, interpret)

    # --- bucket tail-piece positions from the sorted keys alone ---------
    w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    counts = jnp.zeros((Wt, nbuckets + 1), jnp.int32).at[
        w_iota, jnp.minimum(k, nbuckets)
    ].add(1)
    ends = jnp.cumsum(counts[:, :nbuckets], axis=1)  # (Wt, NB) exclusive
    use = (counts[:, :nbuckets] > 0) & (ends % rows != 0)
    last = jnp.maximum(ends - 1, 0)
    row_idx = last % rows
    lane_idx = w_iota * cols + last // rows

    # gather 264B rows from the (rows, NL, 3L) transposed stream
    acc_t = jnp.swapaxes(acc_stream, 1, 2)  # (rows, NL, 3L)
    vals = acc_t[row_idx, lane_idx]  # (Wt, NB, 3L)
    ident = jnp.concatenate(
        [
            jnp.zeros((L,), jnp.int32),
            curve.ops.one_mont.astype(jnp.int32),
            jnp.zeros((L,), jnp.int32),
        ]
    )
    buckets_cat = jnp.where(use[..., None], vals, ident)
    # pad sink + scratch slots with identity
    pad = jnp.broadcast_to(ident, (Wt, 2, 3 * L))
    buckets_cat = jnp.concatenate([buckets_cat, pad], axis=1)
    buckets = tuple(
        buckets_cat[..., c * L : (c + 1) * L] for c in range(3)
    )

    # --- lane-final leftovers for the caller's suffix-sum merge ---------
    fin = acc_stream[rows - 1].reshape(3 * L, Wt, cols)
    acc = tuple(
        jnp.moveaxis(fin[c * L : (c + 1) * L], 0, -1) for c in range(3)
    )  # (Wt, cols, L) x3
    acc_key = keys_arr[rows - 1].reshape(Wt, cols)
    return buckets, acc, acc_key
