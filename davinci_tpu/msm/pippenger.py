"""Multi-scalar multiplication (Pippenger) as a TPU-native data-parallel
pipeline.

Replaces (in role) gnark-crypto's goroutine-parallel Pippenger and the
ICICLE CUDA MSM the reference offloads to (reference prover/prover_gpu.go,
SURVEY.md §2.3) — the #1 kernel target of BASELINE.json.

Design:
  * Window size == LIMB_BITS (12): the j-th scalar limb *is* the bucket
    index for window j — no bit plumbing.
  * Bucket accumulation per window: sort points by bucket index, lay the
    sorted stream out column-major as (rows, COLS) and run ONE lax.scan down
    the rows.  Each column maintains a running segment accumulator; when a
    column's key changes, the finished segment total is scattered into the
    bucket array.  Because a key's run is contiguous in sorted order, at most
    one column emits a given bucket mid-scan — scatters are conflict-free —
    and cross-column boundary runs surface as per-column leftovers that a
    small fori_loop merges afterwards.  Total group work: exactly one point
    addition per point per window (optimal Pippenger), in n/COLS sequential
    steps of COLS-wide batched complete additions — long vectors for the
    VPU, one addition-graph instantiation for the compiler.
  * Bucket reduction sum_b b*S_b: batched 12-bit double-and-add over all
    4096 buckets at once + recursive-doubling tree reduction (roll+add).
  * Windows combined by Horner (12 doublings per step).
  * Multi-chip: points are sharded; each device produces local bucket
    arrays which are combined with point additions after an all_gather —
    bucket arrays are tiny (2^12 points) next to the point set, so this is
    the natural ICI-friendly cut (SURVEY.md §5 "distributed communication
    backend").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS

WINDOW_BITS = LIMB_BITS
NBUCKETS = 1 << WINDOW_BITS  # bucket 0 contributes nothing (b * S_0 with b=0)
COLS = 2048  # scan width: batched point-adds per sequential step


def _bucket_accumulate(curve, xs, ys, zs, keys):
    """Per-window bucket sums via sort + column-wise segmented scan.

    xs/ys/zs: (n, L) Montgomery limbs (n padded to a multiple of COLS by the
    caller, padding keys == NBUCKETS); keys: (n,) int32 bucket indices.
    Returns bucket arrays (NBUCKETS+1, L) x3 (identity where empty; slot
    NBUCKETS is the padding sink).
    """
    n = keys.shape[0]
    trailing = xs.shape[1:]  # (L,) for Fp coords, (2, L) for Fp2
    assert n % COLS == 0
    rows = n // COLS

    order = jnp.argsort(keys)
    k = keys[order]
    pts = (xs[order], ys[order], zs[order])

    # column-major layout: column c owns sorted slice [c*rows, (c+1)*rows)
    k2 = k.reshape(COLS, rows).T  # (rows, COLS)
    p2 = tuple(
        jnp.moveaxis(a.reshape((COLS, rows) + trailing), 0, 1) for a in pts
    )

    buckets0 = curve.identity((NBUCKETS + 1,))

    def step(carry, row):
        buckets, acc, acc_key = carry
        key_r, pt_r = row
        same = key_r == acc_key
        merged = curve.add(acc, pt_r)
        emit_idx = jnp.where(same, NBUCKETS + 1, acc_key)  # OOB -> dropped
        buckets = tuple(
            b.at[emit_idx].set(a, mode="drop") for b, a in zip(buckets, acc)
        )
        acc = curve.select(same, merged, pt_r)
        return (buckets, acc, key_r), None

    init_acc = tuple(a[0] for a in p2)
    init_key = k2[0]
    rows_rest = (k2[1:], tuple(a[1:] for a in p2))
    (buckets, acc, acc_key), _ = jax.lax.scan(
        step, (buckets0, init_acc, init_key), rows_rest
    )

    # merge per-column leftovers (cross-column runs) in log depth: a
    # segmented suffix-sum over the (sorted) leftover keys, then one
    # conflict-free scatter-add at each run start.
    keys_l = acc_key
    col_iota = jnp.arange(COLS, dtype=jnp.int32)
    ident_cols = curve.identity((COLS,))

    def suffix_step(i, s):
        stride = 1 << i
        valid = col_iota < (COLS - stride)
        pk = jnp.where(valid, jnp.roll(keys_l, -stride), -1)
        ps = curve.select(
            valid, tuple(jnp.roll(a, -stride, axis=0) for a in s), ident_cols
        )
        same = keys_l == pk
        return curve.select(same, curve.add(s, ps), s)

    s = jax.lax.fori_loop(0, COLS.bit_length() - 1, suffix_step, acc)

    start = jnp.concatenate(
        [jnp.ones((1,), bool), keys_l[1:] != keys_l[:-1]]
    )
    cur = tuple(b[keys_l] for b in buckets)
    merged = curve.add(cur, s)
    idx = jnp.where(start, keys_l, NBUCKETS + 1)  # OOB -> dropped
    buckets = tuple(
        b.at[idx].set(m, mode="drop") for b, m in zip(buckets, merged)
    )
    return buckets


def _bucket_reduce(curve, buckets):
    """sum_b b * S_b over (NBUCKETS+1, L) bucket arrays -> single point.

    The padding sink (slot NBUCKETS) and bucket 0 contribute nothing because
    their weights' bits are masked / zero.
    """
    bidx = jnp.arange(NBUCKETS + 1, dtype=jnp.int32)
    weights = jnp.where(bidx == NBUCKETS, 0, bidx)  # padding sink -> weight 0

    def dbl_add(bit, carry):
        acc, cur = carry
        take = ((weights >> bit) & 1) == 1
        acc = curve.select(take, curve.add(acc, cur), acc)
        return acc, curve.double(cur)

    acc0 = curve.identity((NBUCKETS + 1,))
    acc, _ = jax.lax.fori_loop(0, WINDOW_BITS, dbl_add, (acc0, buckets))
    # drop the padding sink (its weight is 0 -> identity accumulator)
    acc = tuple(a[:NBUCKETS] for a in acc)

    # recursive-doubling tree reduction over the 4096 slots: after log2(N)
    # rounds of acc_i += acc_{(i+s) mod N}, slot 0 holds the full sum.
    def tree(i, a):
        s = NBUCKETS >> 1 >> i  # 2048, 1024, ..., 1
        rolled = tuple(jnp.roll(x, -s, axis=0) for x in a)
        return curve.add(a, rolled)

    acc = jax.lax.fori_loop(0, WINDOW_BITS, tree, acc)
    return tuple(a[0] for a in acc)


def _window_body(curve, xs, ys, zs, scalar_limbs, j):
    keys = jax.lax.dynamic_index_in_dim(scalar_limbs, j, axis=-1, keepdims=False)
    buckets = _bucket_accumulate(curve, xs, ys, zs, keys)
    return _bucket_reduce(curve, buckets)


def _horner(curve, sums, W):
    """Combine window sums: total = sum_j 2^(12 j) * S_j (Horner, MSB down)."""
    total = tuple(s[W - 1] for s in sums)

    def step(j, tot):
        tot = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, t: curve.double(t), tot
        )
        nxt = tuple(
            jax.lax.dynamic_index_in_dim(s, W - 1 - j, axis=0, keepdims=False)
            for s in sums
        )
        return curve.add(tot, nxt)

    return jax.lax.fori_loop(1, W, step, total)


def _pad_inputs(curve, xs, ys, zs, scalar_limbs):
    n = xs.shape[0]
    # bucket to powers of two so only log-many shapes ever compile
    n_pad = max(COLS, 1 << (n - 1).bit_length() if n > 1 else COLS)
    n_pad = -(-n_pad // COLS) * COLS
    if n_pad != n:
        extra = n_pad - n
        ident = curve.identity((extra,))
        xs = jnp.concatenate([xs, ident[0]])
        ys = jnp.concatenate([ys, ident[1]])
        zs = jnp.concatenate([zs, ident[2]])
        pad_keys = jnp.full((extra, scalar_limbs.shape[-1]), NBUCKETS, jnp.int32)
        scalar_limbs = jnp.concatenate([scalar_limbs, pad_keys])
    return xs, ys, zs, scalar_limbs


@functools.partial(jax.jit, static_argnums=0)
def _msm_jit(curve, xs, ys, zs, scalar_limbs):
    W = scalar_limbs.shape[-1]
    sums = jax.lax.map(
        lambda j: _window_body(curve, xs, ys, zs, scalar_limbs, j),
        jnp.arange(W),
    )
    return _horner(curve, sums, W)


def msm(curve, points, scalar_limbs):
    """MSM on device.

    curve: DeviceCurve; points: (X, Y, Z) Montgomery limb batch (n, L) each;
    scalar_limbs: (n, W) raw base-2^12 limbs of the scalars.
    Returns a single projective point (tuple of (L,) arrays).
    """
    xs, ys, zs = points
    xs, ys, zs, scalar_limbs = _pad_inputs(curve, xs, ys, zs, scalar_limbs)
    return _msm_jit(curve, xs, ys, zs, scalar_limbs)


def scalars_to_limbs(spec, scalars) -> np.ndarray:
    """Host ints -> (n, W) int32 window/limb decomposition (raw, base 2^12)."""
    W = -(-spec.r.bit_length() // WINDOW_BITS)
    S = np.zeros((len(scalars), W), np.int32)
    for i, s in enumerate(scalars):
        v = int(s) % spec.r
        for j in range(W):
            S[i, j] = v & (NBUCKETS - 1)
            v >>= WINDOW_BITS
    return S


def msm_host_input(curve, affine_points, scalars):
    """Convenience: host AffinePoints + int scalars -> device MSM -> host
    AffinePoint."""
    P = curve.encode_points(affine_points)
    S = scalars_to_limbs(curve.spec, scalars)
    out = msm(curve, P, jnp.asarray(S))
    batched = tuple(a[None] for a in out)
    return curve.decode_points(batched)[0]


# ---------------------------------------------------------------------------
# Multi-chip sharded MSM
# ---------------------------------------------------------------------------


def sharded_msm(curve, points, scalar_limbs, mesh, axis_name="shard"):
    """MSM with points/scalars sharded over `axis_name` of `mesh`.

    Each device accumulates buckets for its point shard; bucket arrays are
    all_gathered (tiny vs the point set) and merged with point additions,
    then every device runs the identical bucket/window reduction.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    ndev = mesh.shape[axis_name]
    W = scalar_limbs.shape[-1]

    def local(xs, ys, zs, sl):
        def per_window(j):
            keys = jax.lax.dynamic_index_in_dim(sl, j, axis=-1, keepdims=False)
            return _bucket_accumulate(curve, xs, ys, zs, keys)

        buckets = jax.lax.map(per_window, jnp.arange(W))  # (W, NB+1, L) x3
        gathered = jax.lax.all_gather(buckets, axis_name)  # (D, W, NB+1, L) x3

        def fold(d, acc):
            return curve.add(
                acc, tuple(jax.lax.dynamic_index_in_dim(g, d, 0, keepdims=False) for g in gathered)
            )

        acc = tuple(g[0] for g in gathered)
        acc = jax.lax.fori_loop(1, ndev, fold, acc)

        sums = jax.lax.map(
            lambda j: _bucket_reduce(curve, tuple(a[j] for a in acc)),
            jnp.arange(W),
        )
        return _horner(curve, sums, W)

    spec_in = P(axis_name)
    try:
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_in, spec_in, spec_in, spec_in),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    except TypeError:  # older jax: the flag was called check_rep
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_in, spec_in, spec_in, spec_in),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
    xs, ys, zs = points
    xs, ys, zs, scalar_limbs = _pad_inputs(curve, xs, ys, zs, scalar_limbs)
    # per-device shard must itself be a multiple of COLS
    n = xs.shape[0]
    per_dev = -(-n // (ndev * COLS)) * COLS
    tot = per_dev * ndev
    if tot != n:
        extra = tot - n
        ident = curve.identity((extra,))
        xs = jnp.concatenate([xs, ident[0]])
        ys = jnp.concatenate([ys, ident[1]])
        zs = jnp.concatenate([zs, ident[2]])
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.full((extra, W), NBUCKETS, jnp.int32)]
        )
    return jax.jit(fn)(xs, ys, zs, scalar_limbs)
