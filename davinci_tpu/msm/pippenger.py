"""Multi-scalar multiplication (Pippenger) as a TPU-native data-parallel
pipeline.

Replaces (in role) gnark-crypto's goroutine-parallel Pippenger and the
ICICLE CUDA MSM the reference offloads to (reference prover/prover_gpu.go,
SURVEY.md §2.3) — the #1 kernel target of BASELINE.json.

Design:
  * Window size == LIMB_BITS (12): the j-th scalar limb *is* the bucket
    index for window j — no bit plumbing.
  * ALL windows are processed simultaneously: batched ops carry a leading
    (W, ...) axis, so each vector op sees W*COLS lanes (tens of thousands)
    — the TPU wants few big ops, not many small ones.  A window-tile knob
    caps the sorted-copy working set for huge n.
  * Bucket accumulation per window: sort point indices by bucket, lay the
    stream out column-major (rows, COLS) and run ONE lax.scan down the
    rows; each column keeps a running segment accumulator and emits
    finished segments into the bucket array with conflict-free scatters
    (a key's run is contiguous, so exactly one column emits it mid-scan).
    Cross-column runs surface as per-column leftovers, merged by a
    log-depth segmented suffix-sum.  Total group work: one point addition
    per point per window — optimal Pippenger.
  * Bucket reduction sum_b b*S_b: batched 12-bit double-and-add over all
    W*4096 buckets at once + recursive-doubling tree reduction (roll+add).
  * Windows combined by Horner (12 doublings per step).
  * Multi-chip: points are sharded; each device produces local bucket
    arrays which are combined with point additions after an all_gather —
    bucket arrays are tiny next to the point set, so this is the natural
    ICI-friendly cut (SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS

WINDOW_BITS = LIMB_BITS
NBUCKETS = 1 << WINDOW_BITS  # bucket 0 contributes nothing (b * S_0, b=0)
# signed-digit kernel path: digits recoded to [-2048, 2048] halve the
# bucket count (and the bucket-reduce group work) — the standard
# Pippenger signed-window trick, TPU-shaped: the sign rides bit 0 of the
# sort key and the scan kernel negates y on the fly (one field sub)
SIGNED_NBUCKETS = NBUCKETS // 2
COLS = 2048  # scan width per window: batched point-adds per sequential step
# cap on sorted-point working set (elements of (W_tile * n)); ~1.5GB at L=22
MAX_TILE_ELEMS = 1 << 23


def _signed_sort_keys(limbs):
    """(n, W) raw base-2^12 digits -> (n, W) int32 signed-scheme SORT keys.

    Recode d_j to [-2048, 2047] (top window unsigned, see below), then
    key = (|d| - 1) * 2 + sign for d != 0; zero digits go to the sink key
    2*SIGNED_NBUCKETS (== NBUCKETS, the same value `_pad_inputs` pads
    with — call this BEFORE padding).  Bucket slot i holds the sum of
    (sign-applied) points with |digit| == i + 1, so the reduce weights
    slot i by i+1 (the `shifted` combine).

    Contract: each scalar's value < 2^(12W - 1), i.e. the top raw digit
    is <= 2047 (true for any scalar reduced mod r when r.bit_length()
    <= 12W - 1 — every registered curve; asserted in scalars_to_limbs).
    The top window is NOT recoded: with the contract it absorbs the
    final carry without overflow (<= 2048)."""
    n, W = limbs.shape
    snb = SIGNED_NBUCKETS
    carry = jnp.zeros((n,), jnp.int32)
    ds = []
    for j in range(W):
        v = limbs[:, j] + carry
        if j == W - 1:
            ds.append(v)
            break
        neg = (v >= snb).astype(jnp.int32)
        ds.append(v - neg * NBUCKETS)
        carry = neg
    D = jnp.stack(ds, axis=1)  # signed digits, |D| <= 2048
    sign = (D < 0).astype(jnp.int32)
    mag = jnp.abs(D)
    return jnp.where(mag == 0, 2 * snb, (mag - 1) * 2 + sign).astype(
        jnp.int32
    )


def _flat_scatter_set(buckets, w_idx, b_idx, vals, nb):
    """Conflict-free scatter into (W, NB+2, ...) bucket arrays via flat
    indices; out-of-range b_idx drops."""
    W = buckets[0].shape[0]
    flat_idx = (w_idx * (nb + 2) + b_idx).reshape(-1)
    out = []
    for buf, v in zip(buckets, vals):
        trailing = buf.shape[2:]
        flat = buf.reshape((W * (nb + 2),) + trailing)
        upd = v.reshape((-1,) + trailing)
        flat = flat.at[flat_idx].set(upd, mode="drop")
        out.append(flat.reshape(buf.shape))
    return tuple(out)


def _flat_gather(buckets, w_idx, b_idx, nb):
    W = buckets[0].shape[0]
    flat_idx = w_idx * (nb + 2) + b_idx
    return tuple(
        b.reshape((W * (nb + 2),) + b.shape[2:])[flat_idx.reshape(-1)].reshape(
            flat_idx.shape + b.shape[2:]
        )
        for b in buckets
    )


def _bucket_accumulate_fused(curve, xs, ys, zs, keys_all):
    """Bucket sums for a tile of windows at once.

    xs/ys/zs: (n, ...) point coords; keys_all: (Wt, n) bucket indices.
    Returns bucket arrays (Wt, NBUCKETS+2, ...) — slot NBUCKETS is the
    padding sink, slot NBUCKETS+1 is a scratch drop target.
    """
    Wt, n = keys_all.shape
    trailing = xs.shape[1:]
    assert n % COLS == 0
    rows = n // COLS

    order = jnp.argsort(keys_all, axis=1)  # (Wt, n)
    k = jnp.take_along_axis(keys_all, order, axis=1)
    # ONE gather of concatenated coordinates (264B rows) instead of three
    # 88B-row gathers: the random-access point gather is ~45% of the
    # window-sums wall time, and bigger rows amortize it
    pts_cat = jnp.concatenate([xs, ys, zs], axis=-1)  # (n, 3*L...)
    sorted_cat = pts_cat[order]  # (Wt, n, 3*L)
    third = xs.shape[-1]
    pts = (
        sorted_cat[..., :third],
        sorted_cat[..., third : 2 * third],
        sorted_cat[..., 2 * third :],
    )

    # column-major per window: (rows, Wt, COLS, ...)
    k2 = jnp.moveaxis(k.reshape(Wt, COLS, rows), 2, 0)
    p2 = tuple(
        jnp.moveaxis(a.reshape((Wt, COLS, rows) + trailing), 2, 0) for a in pts
    )

    buckets0 = curve.identity((Wt, NBUCKETS + 2))
    w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]

    def step(carry, row):
        buckets, acc, acc_key = carry
        key_r, pt_r = row
        same = key_r == acc_key
        merged = curve.add(acc, pt_r)
        emit_idx = jnp.where(same, NBUCKETS + 1, acc_key)  # scratch -> noise
        # NB+1 scratch slot absorbs all "no emission" writes (conflicts
        # there are harmless: the slot is never read)
        buckets = _flat_scatter_set(buckets, w_iota, emit_idx, acc, NBUCKETS)
        acc = curve.select(same, merged, pt_r)
        return (buckets, acc, key_r), None

    init_acc = tuple(a[0] for a in p2)
    init_key = k2[0]
    (buckets, acc, acc_key), _ = jax.lax.scan(
        step, (buckets0, init_acc, init_key), (k2[1:], tuple(a[1:] for a in p2))
    )

    return _merge_leftovers(curve, buckets, acc, acc_key)


def _merge_leftovers(curve, buckets, acc, acc_key):
    """Fold per-lane final segments (runs that reach their lane's last row)
    into the bucket arrays: log-depth segmented suffix-sum along the lane
    axis groups same-key lane tails, then one gather+add+scatter merges
    each group's total into its bucket.

    buckets: (Wt, NBUCKETS+2, ...) x3; acc: (Wt, cols, ...) x3 lane-final
    accumulators; acc_key: (Wt, cols) lane-final keys (non-decreasing)."""
    Wt, cols = acc_key.shape
    w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    keys_l = acc_key
    col_iota = jnp.arange(cols, dtype=jnp.int32)
    ident_cols = curve.identity((Wt, cols))

    def suffix_step(i, s):
        stride = 1 << i
        valid = col_iota < (cols - stride)
        pk = jnp.where(valid, jnp.roll(keys_l, -stride, axis=1), -1)
        ps = curve.select(
            valid,
            tuple(jnp.roll(a, -stride, axis=1) for a in s),
            ident_cols,
        )
        same = keys_l == pk
        return curve.select(same, curve.add(s, ps), s)

    s = jax.lax.fori_loop(0, cols.bit_length() - 1, suffix_step, acc)

    start = jnp.concatenate(
        [jnp.ones((Wt, 1), bool), keys_l[:, 1:] != keys_l[:, :-1]], axis=1
    )
    cur = _flat_gather(buckets, w_iota, keys_l, NBUCKETS)
    merged = curve.add(cur, s)
    idx = jnp.where(start, keys_l, NBUCKETS + 1)
    buckets = _flat_scatter_set(buckets, w_iota, idx, merged, NBUCKETS)
    return buckets


def _bucket_reduce_fused(curve, buckets):
    """sum_b b*S_b per window over (Wt, NBUCKETS+2, ...) buckets
    -> (Wt, ...) points.

    Identity: sum_b b*S_b == sum_{b>=1} suffix(b) with suffix(b) =
    sum_{k>=b} S_k.  A Hillis-Steele suffix scan (log2(NB) full-width add
    passes) followed by a log-depth tree sum costs ~2 group ops per bucket
    — versus ~3x for the previous per-bit double-and-add + tree."""
    Wt = buckets[0].shape[0]
    acc = tuple(a[:, :NBUCKETS] for a in buckets)
    b_iota = jnp.arange(NBUCKETS, dtype=jnp.int32)
    ident = curve.identity((Wt, NBUCKETS))

    def suffix(i, a):
        stride = 1 << i
        valid = b_iota < (NBUCKETS - stride)
        shifted = curve.select(
            valid, tuple(jnp.roll(x, -stride, axis=1) for x in a), ident
        )
        return curve.add(a, shifted)

    acc = jax.lax.fori_loop(0, WINDOW_BITS, suffix, acc)
    # drop suffix(0) (it would weight bucket 0 once): mask slot 0
    acc = curve.select(b_iota >= 1, acc, ident)

    def tree(i, a):
        s = NBUCKETS >> 1 >> i
        rolled = tuple(jnp.roll(x, -s, axis=1) for x in a)
        return curve.add(a, rolled)

    acc = jax.lax.fori_loop(0, WINDOW_BITS, tree, acc)
    return tuple(a[:, 0] for a in acc)


def _window_tile(n: int, W: int) -> int:
    wt = max(1, MAX_TILE_ELEMS // max(n, 1))
    return min(W, wt)


# ---------------------------------------------------------------------------
# Transposed (L, ...) layout pipeline — the TPU kernel path.
#
# Limbs on sublanes, batch (windows x buckets / columns) on lanes: the
# native layout of the bucket-scan kernel's output stream.  Keeping merge,
# reduce, and Horner in this layout kills the (N, L) <-> (L, N) transposes
# that the jax profiler showed dominating the reduce phase (each point_add
# call round-tripped its operands through HBM transposes).
# ---------------------------------------------------------------------------


def _t_add(curve, p, q):
    """Complete addition on transposed (L, ...) coords (leading limb axis).

    TPU: the fused Pallas kernel on (L, N).  Elsewhere (CPU tests): the
    same RCB15 column composition as plain jnp ops.
    """
    shape = p[0].shape
    L = shape[0]
    p2 = tuple(a.reshape(L, -1) for a in p)
    q2 = tuple(a.reshape(L, -1) for a in q)
    if jax.default_backend() == "tpu":
        from davinci_tpu.ec.pallas_add import point_add_t

        out = point_add_t(curve, p2, q2)
    else:
        # CPU (tests): boundary transposes into the vectorized (..., L)
        # jnp formula.  The per-limb column composition is NOT usable
        # here — XLA:CPU's compile time on that graph shape is
        # pathological (the same pathology behind _use_pipeline's CPU
        # carve-out), while the DeviceField gather+dot_general form
        # compiles fine.
        pT = tuple(jnp.moveaxis(a, 0, -1) for a in p2)
        qT = tuple(jnp.moveaxis(a, 0, -1) for a in q2)
        outT = curve.add(pT, qT)
        out = tuple(jnp.moveaxis(a, -1, 0) for a in outT)
    return tuple(a.reshape(shape) for a in out)


def _t_double(curve, p):
    return _t_add(curve, p, p)


def _t_select(cond, p, q):
    """cond: batch-shaped (no limb axis), right-aligned broadcast against
    the (L, ...batch) coords."""
    return tuple(jnp.where(cond, a, b) for a, b in zip(p, q))


def _t_identity(curve, shape):
    L = curve.df.L
    one = curve.ops.one_mont.astype(jnp.int32).reshape(
        (L,) + (1,) * len(shape)
    )
    x = jnp.zeros((L,) + shape, jnp.int32)
    return (x, jnp.broadcast_to(one, (L,) + shape), x)


def _merge_leftovers_t(curve, buckets, acc, acc_key):
    """Transposed-layout leftover merge: same algebra as _merge_leftovers.

    buckets: (L, Wt, NBUCKETS+2) x3; acc: (L, Wt, cols) x3 lane-final
    accumulators; acc_key: (Wt, cols) lane-final keys (non-decreasing)."""
    L, Wt, cols = acc[0].shape
    keys_l = acc_key
    col_iota = jnp.arange(cols, dtype=jnp.int32)
    ident_cols = _t_identity(curve, (Wt, cols))

    def suffix_step(i, s):
        stride = 1 << i
        valid = col_iota < (cols - stride)
        pk = jnp.where(valid[None, :], jnp.roll(keys_l, -stride, axis=1), -1)
        ps = _t_select(
            valid,
            tuple(jnp.roll(a, -stride, axis=2) for a in s),
            ident_cols,
        )
        same = keys_l == pk
        return _t_select(same, _t_add(curve, s, ps), s)

    s = jax.lax.fori_loop(0, max(cols.bit_length() - 1, 0), suffix_step, acc)

    start = jnp.concatenate(
        [jnp.ones((Wt, 1), bool), keys_l[:, 1:] != keys_l[:, :-1]], axis=1
    )
    nbp = buckets[0].shape[2]
    w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    flat_get = (w_iota * nbp + keys_l).reshape(-1)  # (Wt*cols,)
    cur = tuple(
        b.reshape(L, Wt * nbp)[:, flat_get].reshape(L, Wt, cols)
        for b in buckets
    )
    merged = _t_add(curve, cur, s)
    idx = jnp.where(start, keys_l, nbp - 1)  # scratch slot absorbs non-starts
    flat_set = (w_iota * nbp + idx).reshape(-1)
    out = []
    for b, v in zip(buckets, merged):
        flat = b.reshape(L, Wt * nbp)
        flat = flat.at[:, flat_set].set(v.reshape(L, Wt * cols), mode="drop")
        out.append(flat.reshape(L, Wt, nbp))
    return tuple(out)


def _bucket_reduce_t(curve, buckets, shifted: bool = False):
    """Per-window bucket-weighted sum on (L, Wt, NB+2) buckets -> (L, Wt):
    sum_b b*S_b (shifted=False) or sum_b (b+1)*S_b (shifted=True — the
    signed-digit scheme stores |digit| v at slot v-1).

    TPU: the monolithic Pallas reduce kernel computes per-lane partials
    (2 complete adds per bucket, VMEM-resident) and only the small width-C
    cross-lane combine runs as XLA passes here.  Elsewhere: the full
    suffix-scan identity of _bucket_reduce_fused on minor-axis rolls."""
    nb = buckets[0].shape[2] - 2
    if _use_scan_kernel(curve) and (nb & (nb - 1)) == 0:
        import os

        from davinci_tpu.msm.bucket_kernel import bucket_reduce_kernel

        interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"
        A, B = bucket_reduce_kernel(
            curve, tuple(b[:, :, :nb] for b in buckets), interp
        )
        return _reduce_combine_t(curve, A, B, shifted)
    L, Wt, nbp = buckets[0].shape
    nbits = nb.bit_length() - 1
    acc = tuple(a[:, :, :nb] for a in buckets)
    b_iota = jnp.arange(nb, dtype=jnp.int32)
    ident = _t_identity(curve, (Wt, nb))

    def suffix(i, a):
        stride = 1 << i
        valid = b_iota < (nb - stride)
        sh = _t_select(
            valid, tuple(jnp.roll(x, -stride, axis=2) for x in a), ident
        )
        return _t_add(curve, a, sh)

    acc = jax.lax.fori_loop(0, nbits, suffix, acc)
    if not shifted:
        # drop suffix(0) (it would weight bucket 0 once): mask slot 0
        acc = _t_select(b_iota >= 1, acc, ident)

    def tree(i, a):
        s = nb >> 1 >> i
        rolled = tuple(jnp.roll(x, -s, axis=2) for x in a)
        return _t_add(curve, a, rolled)

    acc = jax.lax.fori_loop(0, nbits, tree, acc)
    return tuple(a[:, :, 0] for a in acc)


def _reduce_combine_t(curve, A, B, shifted: bool = False):
    """Cross-lane combine of the reduce kernel's per-lane partials:
    T_w = C * sum_c B_c + sum_c c*A_c (+ sum_c A_c when shifted) on
    (L, Wt, C) x3 arrays -> (L, Wt).

    One sequential suffix-reduce kernel computes sum_c c*A_c (the weighted
    sum of the A half) and sum_c B_c (the plain sum of the B half) in a
    single launch over lanes [A | B]; only the log2(C) doubling chain and
    the final add remain as XLA point-op calls.  (The prior Hillis-Steele
    suffix + tree composition was ~29ms of launches/HBM round-trips.)"""
    import os

    from davinci_tpu.msm.bucket_kernel import suffix_reduce_kernel

    interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"
    L, Wt, Cw = A[0].shape
    nbits = Cw.bit_length() - 1  # Cw is a power of two
    if os.environ.get("DAVINCI_COMBINE_XLA"):
        return _reduce_combine_xla(curve, A, B, shifted)
    Wp = -(-Wt // 128) * 128

    def prep(t):  # (L, Wt, Cw) x3 -> (Cw, 3L, Wp); pad lanes are junk
        s = jnp.concatenate(t, axis=0)  # (3L, Wt, Cw)
        s = jnp.moveaxis(s, 2, 0)  # (Cw, 3L, Wt)
        if Wp != Wt:
            s = jnp.pad(s, ((0, 0), (0, 0), (0, Wp - Wt)))
        return s

    s = jnp.concatenate([prep(A), prep(B)], axis=2)  # (Cw, 3L, 2Wp)
    A2, B2 = suffix_reduce_kernel(curve, s, interp)  # (3L, 2Wp) each
    wA = tuple(B2[c * L : (c + 1) * L, :Wt] for c in range(3))
    sumB = tuple(A2[c * L : (c + 1) * L, Wp : Wp + Wt] for c in range(3))
    CB = jax.lax.fori_loop(
        0, nbits, lambda _, t: _t_double(curve, t), sumB
    )
    out = _t_add(curve, CB, wA)
    if shifted:  # + sum_c A_c: slot i weighs i+1 = (k*C + c) + 1
        sumA = tuple(A2[c * L : (c + 1) * L, :Wt] for c in range(3))
        out = _t_add(curve, out, sumA)
    return out


def _reduce_combine_xla(curve, A, B, shifted: bool = False):
    """Hillis-Steele suffix + tree composition (perf-comparison fallback,
    DAVINCI_COMBINE_XLA=1)."""
    L, Wt, Cw = A[0].shape
    nbits = Cw.bit_length() - 1
    c_iota = jnp.arange(Cw, dtype=jnp.int32)
    ident = _t_identity(curve, (Wt, Cw))

    def suffix(i, a):
        stride = 1 << i
        valid = c_iota < (Cw - stride)
        sh = _t_select(
            valid, tuple(jnp.roll(x, -stride, axis=2) for x in a), ident
        )
        return _t_add(curve, a, sh)

    acc = jax.lax.fori_loop(0, nbits, suffix, A)
    acc = _t_select(c_iota >= 1, acc, ident)

    def tree(i, a):
        s = Cw >> 1 >> i
        rolled = tuple(jnp.roll(x, -s, axis=2) for x in a)
        return _t_add(curve, a, rolled)

    wA = tuple(a[:, :, 0] for a in jax.lax.fori_loop(0, nbits, tree, acc))
    sumB = tuple(a[:, :, 0] for a in jax.lax.fori_loop(0, nbits, tree, B))
    CB = jax.lax.fori_loop(
        0, nbits, lambda _, t: _t_double(curve, t), sumB
    )
    out = _t_add(curve, CB, wA)
    if shifted:
        sumA = tuple(
            a[:, :, 0] for a in jax.lax.fori_loop(0, nbits, tree, A)
        )
        out = _t_add(curve, out, sumA)
    return out


def _horner_t(curve, sums, W: int):
    """Combine window sums on transposed layout.  sums: (L, W*B) with
    window-major layout (window w, batch b) -> column w*B + b.  Returns
    (L, B) x3."""
    L, WB = sums[0].shape
    B = WB // W
    total = tuple(s[:, (W - 1) * B : W * B] for s in sums)

    def step(j, tot):
        tot = jax.lax.fori_loop(
            0, WINDOW_BITS, lambda _, t: _t_double(curve, t), tot
        )
        start = (W - 1 - j) * B
        nxt = tuple(
            jax.lax.dynamic_slice_in_dim(s, start, B, axis=1) for s in sums
        )
        return _t_add(curve, tot, nxt)

    return jax.lax.fori_loop(1, W, step, total)


def _horner(curve, sums, W):
    """Combine window sums: total = sum_j 2^(12 j) * S_j (Horner, MSB down).
    sums: tuple of (W, ...) arrays."""
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


@functools.partial(jax.jit, static_argnums=0)
def _window_sums_tile(curve, xs, ys, zs, keys_all):
    buckets = _bucket_accumulate_fused(curve, xs, ys, zs, keys_all)
    return _bucket_reduce_fused(curve, buckets)


def _use_scan_kernel(curve) -> bool:
    """The monolithic Pallas bucket-scan kernel serves prime-field curves
    on TPU (Fp2/G2 and CPU use the XLA scan composition).
    DAVINCI_MSM_KERNEL=interpret forces it in interpret mode (tests)."""
    import os

    mode = os.environ.get("DAVINCI_MSM_KERNEL", "")
    if mode == "interpret":
        return curve.ops.coord_ndim == 1
    if mode == "off":
        return False
    return jax.default_backend() == "tpu" and curve.ops.coord_ndim == 1


def _window_sums_tile_kernel(curve, xs, ys, zs, keys_all, interpret=False):
    """Kernel-path window sums (SIGNED sort keys, see _signed_sort_keys)
    — returns TRANSPOSED (L, Wt) x3 sums."""
    from davinci_tpu.msm.bucket_kernel import bucket_accumulate_kernel

    if interpret:
        # eager kernel (tests), jitted merge+reduce
        buckets, acc, acc_key = bucket_accumulate_kernel(
            curve, xs, ys, zs, keys_all, COLS, SIGNED_NBUCKETS, True,
            signed=True,
        )
        return _merge_reduce_t_jit(curve, buckets, acc, acc_key)
    return _window_sums_tile_kernel_jit(curve, xs, ys, zs, keys_all)


@functools.partial(jax.jit, static_argnums=0)
def _merge_reduce_t_jit(curve, buckets, acc, acc_key):
    return _bucket_reduce_t(
        curve, _merge_leftovers_t(curve, buckets, acc, acc_key),
        shifted=True,
    )


@functools.partial(jax.jit, static_argnums=0)
def _window_sums_tile_kernel_jit(curve, xs, ys, zs, keys_all):
    from davinci_tpu.msm.bucket_kernel import bucket_accumulate_kernel

    buckets, acc, acc_key = bucket_accumulate_kernel(
        curve, xs, ys, zs, keys_all, COLS, SIGNED_NBUCKETS, False,
        signed=True,
    )
    buckets = _merge_leftovers_t(curve, buckets, acc, acc_key)
    return _bucket_reduce_t(curve, buckets, shifted=True)


@functools.partial(jax.jit, static_argnums=0)
def _window_sums_packed_jit(curve, packed, is_inf, keys_all):
    """Kernel-path window sums over pre-packed planes (fixed-base MSM:
    the pack depends only on the points, so proving-key bases pack once
    — see bucket_kernel.pack_points)."""
    from davinci_tpu.msm.bucket_kernel import bucket_accumulate_packed

    buckets, acc, acc_key = bucket_accumulate_packed(
        curve, packed, is_inf, keys_all, COLS, SIGNED_NBUCKETS, False,
        signed=True,
    )
    buckets = _merge_leftovers_t(curve, buckets, acc, acc_key)
    return _bucket_reduce_t(curve, buckets, shifted=True)


@functools.partial(jax.jit, static_argnums=0)
def _pack_points_jit(curve, xs, ys, zs):
    from davinci_tpu.msm.bucket_kernel import pack_points

    return pack_points(curve, xs, ys, zs)


_signed_sort_keys_jit = jax.jit(lambda limbs: _signed_sort_keys(limbs))


@functools.partial(jax.jit, static_argnums=0)
def _horner_jit(curve, sums, W: int):
    return _horner(curve, sums, W)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _horner_t_jit(curve, sums, W: int):
    return _horner_t(curve, sums, W)


def _horner_dispatch(curve, sums, W: int):
    """Kernel-path Horner: one monolithic Pallas kernel (VMEM-resident
    accumulator) instead of 13 point-add launches per window."""
    if _use_scan_kernel(curve):
        import os

        from davinci_tpu.msm.bucket_kernel import horner_kernel

        interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"
        return horner_kernel(curve, sums, W, interp)
    return _horner_t_jit(curve, sums, W)


def _pad_inputs(curve, xs, ys, zs, scalar_limbs, multiple: int | None = None):
    if multiple is None:
        multiple = COLS  # module attribute: tests may shrink it
    n = xs.shape[0]
    n_pad = max(multiple, 1 << (n - 1).bit_length() if n > 1 else multiple)
    n_pad = -(-n_pad // multiple) * multiple
    if n_pad != n:
        extra = n_pad - n
        ident = curve.identity((extra,))
        xs = jnp.concatenate([xs, ident[0]])
        ys = jnp.concatenate([ys, ident[1]])
        zs = jnp.concatenate([zs, ident[2]])
        pad_keys = jnp.full(
            (extra, scalar_limbs.shape[-1]), NBUCKETS, jnp.int32
        )
        scalar_limbs = jnp.concatenate([scalar_limbs, pad_keys])
    return xs, ys, zs, scalar_limbs


def _use_pipeline() -> bool:
    """The bucket pipeline is the TPU path; XLA:CPU's compile time on its
    graph is pathological, so CPU (tests, virtual meshes) uses the simple
    batched-double-and-add reference unless explicitly overridden."""
    import os

    if os.environ.get("DAVINCI_FORCE_PIPELINE_MSM"):
        return True
    return jax.default_backend() != "cpu"


@functools.partial(jax.jit, static_argnums=0)
def _msm_reference(curve, xs, ys, zs, scalar_limbs):
    """Batched per-point scalar-mul + recursive-doubling tree reduction —
    O(n * bits) group ops but compile-tiny (reuses the scalar_mul graph)."""
    acc = curve.scalar_mul((xs, ys, zs), scalar_limbs)
    n = xs.shape[0]

    def tree(i, a):
        s = n >> 1 >> i
        rolled = tuple(jnp.roll(x, -s, axis=0) for x in a)
        return curve.add(a, rolled)

    acc = jax.lax.fori_loop(0, n.bit_length() - 1, tree, acc)
    return tuple(a[0] for a in acc)


def msm(curve, points, scalar_limbs, precomp=None):
    """MSM on device.

    curve: DeviceCurve; points: (X, Y, Z) Montgomery limb batch (n, ...)
    each; scalar_limbs: (n, W) raw base-2^12 limbs of the scalars.
    precomp: optional (packed, is_inf) from bucket_kernel.pack_points for
    fixed-base MSMs (proving keys) — skips the per-call plane repack.
    Returns a single projective point.
    """
    xs, ys, zs = points
    if not _use_pipeline():
        n = xs.shape[0]
        n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
        if n_pad != n:
            ident = curve.identity((n_pad - n,))
            xs = jnp.concatenate([xs, ident[0]])
            ys = jnp.concatenate([ys, ident[1]])
            zs = jnp.concatenate([zs, ident[2]])
            scalar_limbs = jnp.concatenate(
                [
                    scalar_limbs,
                    jnp.zeros((n_pad - n, scalar_limbs.shape[-1]), jnp.int32),
                ]
            )
        return _msm_reference(curve, xs, ys, zs, scalar_limbs)
    if _use_scan_kernel(curve):
        import os

        interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"
        # signed recode BEFORE padding (jitted: the 22-step carry chain
        # costs ~100 ms of host dispatch un-jitted); pad keys with
        # NBUCKETS, which is exactly the signed scheme's sink key
        keys = _signed_sort_keys_jit(scalar_limbs)
        if precomp is None:
            packed, is_inf = _pack_points_jit(curve, xs, ys, zs)
        else:
            packed, is_inf = precomp
        n = packed.shape[0]
        n_pad = max(COLS, 1 << (n - 1).bit_length() if n > 1 else COLS)
        n_pad = -(-n_pad // COLS) * COLS
        if n_pad != n:
            extra = n_pad - n
            packed = jnp.pad(packed, ((0, extra), (0, 0)))
            is_inf = jnp.pad(is_inf, (0, extra), constant_values=True)
            keys = jnp.pad(
                keys, ((0, extra), (0, 0)), constant_values=NBUCKETS
            )
        n, W = keys.shape
        wt = _window_tile(n, W)
        keys_all = keys.T  # (W, n)
        if interp:
            tile_fn = functools.partial(
                _window_sums_tile_kernel, interpret=True
            )
            if xs.shape[0] != n:
                ident = curve.identity((n - xs.shape[0],))
                xs = jnp.concatenate([xs, ident[0]])
                ys = jnp.concatenate([ys, ident[1]])
                zs = jnp.concatenate([zs, ident[2]])
            sums = []
            for w0 in range(0, W, wt):
                sums.append(
                    tile_fn(curve, xs, ys, zs, keys_all[w0 : w0 + wt])
                )
        else:
            sums = []
            for w0 in range(0, W, wt):
                sums.append(
                    _window_sums_packed_jit(
                        curve, packed, is_inf, keys_all[w0 : w0 + wt]
                    )
                )
        sums = tuple(jnp.concatenate(parts, axis=1) for parts in zip(*sums))
        out = _horner_dispatch(curve, sums, W)  # (L, 1) x3
        return tuple(a[:, 0] for a in out)
    xs, ys, zs, scalar_limbs = _pad_inputs(curve, xs, ys, zs, scalar_limbs)
    n, W = scalar_limbs.shape
    wt = _window_tile(n, W)
    keys_all = scalar_limbs.T  # (W, n)
    sums = []
    for w0 in range(0, W, wt):
        tile = keys_all[w0 : w0 + wt]
        sums.append(_window_sums_tile(curve, xs, ys, zs, tile))
    sums = tuple(jnp.concatenate(parts, axis=0) for parts in zip(*sums))
    return _horner_jit(curve, sums, W)


def msm_many(curve, points, scalar_limbs):
    """M independent MSMs over the SAME point set in one batched pipeline.

    scalar_limbs: (M, n, W) raw base-2^12 limbs.  The bucket pipeline
    already processes all W windows of one MSM as a batched leading axis;
    (msm, window) pairs simply widen that axis to M*W, so all M
    accumulations ride the same device passes — the natural shape for
    EIP-7594 cell proofs (128 quotient commitments over one Lagrange SRS)
    and batched fixed-base workloads (role: c-kzg-4844
    ComputeCellsAndKZGProofs / ICICLE batched MSM).

    Returns (X, Y, Z) with a leading (M,) axis.
    """
    xs, ys, zs = points
    M, n0, W = scalar_limbs.shape
    if not _use_pipeline():
        outs = [msm(curve, points, scalar_limbs[m]) for m in range(M)]
        return tuple(
            jnp.stack([o[c] for o in outs]) for c in range(3)
        )
    if _use_scan_kernel(curve):
        # per-scalar signed recode (carry chains stop at window W)
        scalar_limbs = _signed_sort_keys(
            scalar_limbs.reshape(M * n0, W)
        ).reshape(M, n0, W)
    flat = jnp.swapaxes(scalar_limbs, 1, 2).reshape(M * W, n0).T  # (n, M*W)
    xs, ys, zs, flat = _pad_inputs(curve, xs, ys, zs, flat)
    n = flat.shape[0]
    keys_all = flat.T  # (M*W, n)
    wt = _window_tile(n, M * W)
    if _use_scan_kernel(curve):
        import os

        interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"
        tile_fn = functools.partial(
            _window_sums_tile_kernel, interpret=interp
        )
        sums = []
        for w0 in range(0, M * W, wt):
            sums.append(tile_fn(curve, xs, ys, zs, keys_all[w0 : w0 + wt]))
        # (L, M*W) batch-major (m*W + w) -> window-major (w*M + m)
        L = sums[0][0].shape[0]
        sums = tuple(jnp.concatenate(parts, axis=1) for parts in zip(*sums))
        sums = tuple(
            jnp.swapaxes(s.reshape(L, M, W), 1, 2).reshape(L, W * M)
            for s in sums
        )
        out = _horner_dispatch(curve, sums, W)  # (L, M) x3
        return tuple(a.T for a in out)
    sums = []
    for w0 in range(0, M * W, wt):
        sums.append(_window_sums_tile(curve, xs, ys, zs, keys_all[w0 : w0 + wt]))
    sums = tuple(jnp.concatenate(parts, axis=0) for parts in zip(*sums))
    # (M*W, ...) -> (W, M, ...): Horner broadcasts over the M batch axis
    sums = tuple(
        jnp.swapaxes(s.reshape((M, W) + s.shape[1:]), 0, 1) for s in sums
    )
    return _horner_jit(curve, sums, W)


def scalars_to_limbs(spec, scalars) -> np.ndarray:
    """Host ints -> (n, W) int32 window/limb decomposition (raw, base 2^12).

    Vectorized via a bytes round-trip: the per-scalar/per-window Python
    loop was a multi-minute host stall at proving-key sizes (millions of
    witness scalars per Groth16 MSM)."""
    W = -(-spec.r.bit_length() // WINDOW_BITS)
    # signed-digit kernel contract (_signed_sort_keys): top digit <= 2047
    assert spec.r.bit_length() <= WINDOW_BITS * W - 1, spec.r.bit_length()
    n = len(scalars)
    if n == 0:
        return np.zeros((0, W), np.int32)
    nb = (W * WINDOW_BITS + 7) // 8 + 1  # +1: 2-byte window reads stay in range
    r = spec.r
    raw = b"".join(
        (int(s) % r).to_bytes(nb, "little") for s in scalars
    )
    u8 = np.frombuffer(raw, np.uint8).reshape(n, nb).astype(np.int32)
    S = np.empty((n, W), np.int32)
    for j in range(W):
        bit = WINDOW_BITS * j
        byte, sh = bit // 8, bit % 8  # sh cycles 0/4: spans <= 2 bytes
        v = (u8[:, byte] >> sh) | (u8[:, byte + 1] << (8 - sh))
        S[:, j] = v & (NBUCKETS - 1)
    return S


def pack_scalars(spec, scalars) -> np.ndarray:
    """Host ints -> (n, P) uint32 little-endian words — the compact
    device-upload form (32 B per 254-bit scalar vs 88 B of expanded
    limbs; the per-MSM scalar upload over the axon tunnel was a measured
    prove-path cost).  Unpack on device with unpack_limbs."""
    nwords = -(-spec.r.bit_length() // 32)
    n = len(scalars)
    if n == 0:
        return np.zeros((0, nwords), np.uint32)
    r = spec.r
    raw = b"".join([(int(s) % r).to_bytes(4 * nwords, "little") for s in scalars])
    return np.frombuffer(raw, np.uint32).reshape(n, nwords).copy()


@functools.partial(jax.jit, static_argnums=(1,))
def unpack_limbs(packed: jnp.ndarray, W: int) -> jnp.ndarray:
    """(n, P) uint32 words -> (n, W) int32 base-2^12 window limbs, on
    device (inverse of the scalars_to_limbs layout)."""
    pk = packed.astype(jnp.uint32)
    pk = jnp.concatenate(
        [pk, jnp.zeros(pk.shape[:-1] + (1,), jnp.uint32)], axis=-1
    )
    cols = []
    for j in range(W):
        bit = WINDOW_BITS * j
        w, sh = bit // 32, bit % 32
        v = pk[..., w] >> sh
        if sh > 32 - WINDOW_BITS:
            v = v | (pk[..., w + 1] << (32 - sh))
        cols.append(v & (NBUCKETS - 1))
    return jnp.stack(cols, axis=-1).astype(jnp.int32)


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
    pipeline = _use_pipeline()

    def _fold_gathered(gathered):
        def fold(d, acc):
            nxt = tuple(
                jax.lax.dynamic_index_in_dim(g, d, 0, keepdims=False)
                for g in gathered
            )
            return curve.add(acc, nxt)

        acc = tuple(g[0] for g in gathered)
        return jax.lax.fori_loop(1, ndev, fold, acc)

    import os

    kernel = _use_scan_kernel(curve)
    interp = os.environ.get("DAVINCI_MSM_KERNEL") == "interpret"

    def local(xs, ys, zs, sl):
        if pipeline:
            if kernel:
                from davinci_tpu.msm.bucket_kernel import (
                    bucket_accumulate_kernel,
                )

                buckets, acc, acc_key = bucket_accumulate_kernel(
                    curve, xs, ys, zs, sl.T, COLS, SIGNED_NBUCKETS, interp,
                    signed=True,
                )
                buckets = _merge_leftovers_t(curve, buckets, acc, acc_key)
                # local bucket arrays are tiny vs the point shard: gather
                # them over ICI and fold with point adds on every device
                gathered = jax.lax.all_gather(buckets, axis_name)

                def fold_t(d, a):
                    nxt = tuple(
                        jax.lax.dynamic_index_in_dim(g, d, 0, keepdims=False)
                        for g in gathered
                    )
                    return _t_add(curve, a, nxt)

                accum = tuple(g[0] for g in gathered)
                accum = jax.lax.fori_loop(1, ndev, fold_t, accum)
                sums = _bucket_reduce_t(curve, accum, shifted=True)
                from davinci_tpu.msm.bucket_kernel import horner_kernel

                out = horner_kernel(curve, sums, W, interp)
                return tuple(a[:, 0] for a in out)
            buckets = _bucket_accumulate_fused(curve, xs, ys, zs, sl.T)
            gathered = jax.lax.all_gather(buckets, axis_name)
            acc = _fold_gathered(gathered)
            sums = _bucket_reduce_fused(curve, acc)
            return _horner(curve, sums, W)
        # CPU/reference: local partial MSM, gather the D partial points,
        # fold with point adds (same ICI cut, compile-tiny graph)
        partial = _msm_reference(curve, xs, ys, zs, sl)
        gathered = jax.lax.all_gather(partial, axis_name)  # (D, ...) x3
        return _fold_gathered(gathered)

    spec_in = P(axis_name)
    kwargs = dict(
        mesh=mesh,
        in_specs=(spec_in, spec_in, spec_in, spec_in),
        out_specs=(P(), P(), P()),
    )
    try:
        fn = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # older jax: the flag was called check_rep
        fn = shard_map(local, check_rep=False, **kwargs)

    xs, ys, zs = points
    if pipeline and kernel:
        # signed recode BEFORE padding (pad keys == the signed sink key)
        scalar_limbs = _signed_sort_keys(scalar_limbs)
    # the pipeline branch needs COLS-wide shards for the bucket scan; the
    # reference branch only needs equal power-of-two shards (its tree
    # reduction) — COLS-padding there just multiplies CPU execution time
    xs, ys, zs, scalar_limbs = _pad_inputs(
        curve, xs, ys, zs, scalar_limbs,
        multiple=(COLS * ndev) if pipeline else ndev,
    )
    return jax.jit(fn)(xs, ys, zs, scalar_limbs)
