"""Monolithic Pallas TPU kernel for Pippenger bucket accumulation.

Replaces the lax.scan + per-step scatter composition in pippenger.py
(`_bucket_accumulate_fused`) on the TPU path.  The kernel keeps the
running accumulator in VMEM scratch across sequential grid steps (TPU
grids execute in order on one core), fuses the same-key compare + select
into the addition, and writes the running accumulator stream to HBM.

Input-traffic design (the measured bottleneck at n=2^18 was materializing
the gathered/tiled point stream, not compute): MSM inputs are AFFINE
(proving-key bases, SRS points — z==1 by construction; infinities are
routed to the padding sink via their bucket key), and 12-bit Montgomery
limbs fit in 16 bits, so the kernel consumes ONE int32 plane per limb
with x in the low and y in the high half — (rows, L, nl) instead of
(rows, 3L, nl), a 3x cut of the sorted-stream bytes.  The addition is the
RCB15 complete MIXED formula (Algorithm 8, a=0, 13M incl. 2 b3-muls).

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

from davinci_tpu.ec.pallas_add import _make_field_ops, _rcb15, _rcb15_mixed


def _scan_kernel(p_ref, np_ref, b3_ref, one_ref, keys_ref, pts_ref, out_ref,
                 acc_ref, key_ref, *, signed=False):
    L = p_ref.shape[0]
    r = pl.program_id(1)
    key = keys_ref[0, 0, :]
    bucket = (key >> 1) if signed else key
    # unpack the affine point from DENSE base-2^16 transport planes: plane
    # j carries bits [16j, 16j+16) of x in the low int32 half and of y in
    # the high half (ceil(12L/16) planes instead of L — 23% less sorted-
    # stream HBM traffic).  y's plane can set the int32 sign bit, so the
    # high half is masked after the arithmetic shift.
    LP = pts_ref.shape[1]
    packed = [pts_ref[0, j, :] for j in range(LP)]
    X16 = [v & 0xFFFF for v in packed]
    Y16 = [(v >> 16) & 0xFFFF for v in packed]

    def to12(u):
        out = []
        for i in range(L):
            bit = 12 * i
            b, t = bit // 16, bit % 16
            v = u[b] >> t
            if t > 4 and b + 1 < LP:  # 12-bit window spills into plane b+1
                v = v | (u[b + 1] << (16 - t))
            out.append(v & 0xFFF)
        return out

    X2 = to12(X16)
    Y2 = to12(Y16)
    one = [one_ref[i, 0] for i in range(L)]
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    b3 = [b3_ref[i, 0] for i in range(L)]
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)
    if signed:
        # sign bit 0 of the sort key: negate y on the fly (-P = (x, -y))
        sgn = (key & 1) == 1
        negY = sub([jnp.zeros_like(c) for c in Y2], Y2)
        Y2 = [jnp.where(sgn, nv, yv) for nv, yv in zip(negY, Y2)]

    def emit(cols):
        # out block is (1, lt, 3L): one VMEM transpose per step keeps the
        # HBM stream in row-major (position, limb) layout, so the bucket
        # tail-piece reads downstream are contiguous 264B row gathers —
        # not scattered element gathers over 176KB strides (measured 88ms
        # vs ~5ms at n=2^18)
        out_ref[0] = jnp.stack(cols).T

    @pl.when(r == 0)
    def _init():
        z = [jnp.broadcast_to(one[i], X2[i].shape) for i in range(L)]
        emit(X2 + Y2 + z)
        for i in range(L):
            acc_ref[i, :] = X2[i]
            acc_ref[L + i, :] = Y2[i]
            acc_ref[2 * L + i, :] = z[i]
        key_ref[0, :] = key

    @pl.when(r > 0)
    def _step():
        P1 = tuple(
            [acc_ref[c * L + i, :] for i in range(L)] for c in range(3)
        )
        merged = _rcb15_mixed(mul, add, sub, b3, P1, (X2, Y2))
        prev = key_ref[0, :]
        # same-BUCKET test: with signed keys a run may cross the sign
        # boundary (key = 2*bucket + sign); points are already negated
        same = bucket == ((prev >> 1) if signed else prev)
        fresh = (X2, Y2, [jnp.broadcast_to(one[i], X2[i].shape) for i in range(L)])
        vs = []
        for c in range(3):
            for i in range(L):
                v = jnp.where(same, merged[c][i], fresh[c][i])
                acc_ref[c * L + i, :] = v
                vs.append(v)
        emit(vs)
        key_ref[0, :] = key


def _lane_tile(nl: int) -> int:
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if nl % cand == 0:
            return cand
    return nl


def _bucket_scan(curve, pts_arr, keys_arr, interpret=False, signed=False):
    if interpret:
        # eager interpret mode (tests): jitting the interpreted grid is
        # pathological on XLA:CPU
        return _bucket_scan_impl(curve, pts_arr, keys_arr, True, signed)
    return _bucket_scan_jit(curve, pts_arr, keys_arr, signed)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _bucket_scan_jit(curve, pts_arr, keys_arr, signed=False):
    return _bucket_scan_impl(curve, pts_arr, keys_arr, False, signed)


def _bucket_scan_impl(curve, pts_arr, keys_arr, interpret, signed=False):
    """pts_arr: (rows, LP, NL) sorted column-major PACKED affine points
    (dense base-2^16 planes, x low half / y high half per int32); keys_arr:
    (rows, NL) sorted bucket keys.
    Returns the projective running accumulator stream (rows, NL, 3L) —
    row-major (position, limb) so tail reads are contiguous rows."""
    df = curve.df
    L = df.L
    rows, LP, nl = pts_arr.shape
    assert LP == (12 * L + 15) // 16
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
        (1, LP, lt), lambda t, r: (r, 0, t), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, lt, 3 * L), lambda t, r: (r, t, 0), memory_space=pltpu.VMEM
    )
    one_mont = curve.ops.one_mont.astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_scan_kernel, signed=signed),
        out_shape=jax.ShapeDtypeStruct((rows, nl, 3 * L), jnp.int32),
        grid=grid,
        in_specs=[const_spec] * 4 + [keys_spec, pts_spec],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((3 * L, lt), jnp.int32),
            pltpu.VMEM((1, lt), jnp.int32),
        ],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        df.p_limbs[:, None], df.nprime_limbs[:, None], curve.b3[:, None],
        one_mont[:, None], keys_arr[:, None, :], pts_arr,
    )


def pack_points(curve, xs, ys, zs):
    """(n, L) coords -> ((n, LP) packed 16-bit planes, (n,) is_inf).

    Dense base-2^16 repack: 12-bit limbs leave 20 dead bits per int32
    plane; ceil(12L/16) planes of (x16 | y16 << 16) cut the sorted-stream
    gather traffic by a further 23% (the measured e2e bottleneck).  A
    16-bit window over 12-bit limbs spans at most two limbs (the offset
    16j mod 12 cycles 0/4/8, so limb q and q+1 always cover it).

    Depends only on the POINTS — proving-key MSM bases are fixed across
    proves, so callers cache this (EncodedBases.device_packed) and skip
    the repack on every MSM call (ICICLE's precompute role).
    """
    L = xs.shape[-1]
    LP = (12 * L + 15) // 16

    def pack16(a):  # (n, L) 12-bit limbs -> (n, LP) 16-bit planes
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
    # infinity (z == 0) -> sink key in every window; z is 0-or-1 encoded
    is_inf = jnp.all(zs == 0, axis=-1)  # (n,)
    return packed, is_inf


def bucket_accumulate_kernel(
    curve, xs, ys, zs, keys_all, cols: int, nbuckets: int,
    interpret: bool = False, signed: bool = False,
):
    """Bucket sums for a tile of windows via the monolithic scan kernel.

    xs/ys/zs: (n, L) point coords with z in {0, 1} per the affine input
    contract (encode_points / identity padding); keys_all: (Wt, n) bucket
    indices — signed=False: plain bucket indices with padding as key ==
    nbuckets; signed=True: SORT keys 2*bucket + sign from
    pippenger._signed_sort_keys with padding/zero-digits at 2*nbuckets
    (the kernel negates y for sign-1 elements and slot i weighs i+1).
    Infinity points are key-redirected to the sink here.  Returns
    TRANSPOSED bucket arrays (L, Wt, nbuckets+2) x3 (slot nbuckets =
    padding sink, nbuckets+1 = scratch) plus lane-final leftover state
    (L, Wt, cols) x3 / (Wt, cols) BUCKET-space keys for the caller's
    suffix-sum merge (pippenger._merge_leftovers_t) — the pipeline stays
    in the limb-major layout end-to-end.
    """
    packed, is_inf = pack_points(curve, xs, ys, zs)
    return bucket_accumulate_packed(
        curve, packed, is_inf, keys_all, cols, nbuckets, interpret, signed
    )


def bucket_accumulate_packed(
    curve, packed, is_inf, keys_all, cols: int, nbuckets: int,
    interpret: bool = False, signed: bool = False,
):
    """bucket_accumulate_kernel over pre-packed planes (see pack_points)."""
    Wt, n = keys_all.shape
    LP = packed.shape[-1]
    L = curve.df.L
    assert (12 * L + 15) // 16 == LP
    assert n % cols == 0
    rows = n // cols
    nl = Wt * cols
    sink = 2 * nbuckets if signed else nbuckets

    keys_all = jnp.where(is_inf[None, :], sink, keys_all)

    order = jnp.argsort(keys_all, axis=1)  # (Wt, n)
    k = jnp.take_along_axis(keys_all, order, axis=1)

    # column-major lanes: sorted position s -> (lane s//rows, row s%rows).
    # The permutation is applied to the 23MB INDEX array so the 390MB
    # payload gather lands directly in the kernel's row-major stream order
    # with only a minor-axis swap left.  Measured e2e-equivalent to the
    # gather-then-relayout composite (XLA fuses that permute into the
    # gather); kept for the simpler fusion graph.  The gather itself is
    # the floor: ~89ms for 5.8M random 68B rows (scripts/gather_probe.py).
    order2 = (
        order.reshape(Wt, cols, rows).transpose(2, 0, 1).reshape(rows, nl)
    )
    pts_arr = jnp.swapaxes(packed[order2], 1, 2)  # (rows, LP, nl)
    keys_arr = (
        k.reshape(Wt, cols, rows).transpose(2, 0, 1).reshape(rows, nl)
    )

    acc_stream = _bucket_scan(curve, pts_arr, keys_arr, interpret, signed)

    # --- bucket tail-piece positions from the sorted keys alone ---------
    # ONE searchsorted per window (method="sort": one fused sort pass —
    # the default binary-search lowering AND a scatter-add histogram both
    # measured 80-95ms of the epilogue at n=2^18); keys are ints, so
    # starts[b] = # keys < b = ends[b-1].  Signed keys are 2*bucket+sign:
    # # elements with bucket <= b == # keys <= 2b+1.
    w_iota = jnp.arange(Wt, dtype=jnp.int32)[:, None]
    b_iota = jnp.arange(nbuckets, dtype=jnp.int32)
    b_query = (2 * b_iota + 1) if signed else b_iota
    ends = jax.vmap(
        lambda kk: jnp.searchsorted(
            kk, b_query, side="right", method="sort"
        )
    )(k).astype(jnp.int32)  # (Wt, NB): # keys <= b
    starts = jnp.concatenate(
        [jnp.zeros((Wt, 1), jnp.int32), ends[:, :-1]], axis=1
    )
    use = (ends > starts) & (ends % rows != 0)
    last = jnp.maximum(ends - 1, 0)
    row_idx = last % rows
    lane_idx = w_iota * cols + last // rows

    # tail values: contiguous 264B ROW gathers from the row-major stream
    # (the kernel emits (rows, NL, 3L)), then one small (~24MB) transpose
    # into the pipeline's limb-major layout
    flat_rows = acc_stream.reshape(rows * nl, 3 * L)
    vals = flat_rows[(row_idx * nl + lane_idx).reshape(-1)].reshape(
        Wt, nbuckets, 3 * L
    )
    vals_t = jnp.moveaxis(vals, 2, 0)  # (3L, Wt, NB)

    one = curve.ops.one_mont.astype(jnp.int32)
    ident_t = jnp.concatenate(
        [jnp.zeros((L,), jnp.int32), one, jnp.zeros((L,), jnp.int32)]
    )[:, None, None]
    vals_t = jnp.where(use[None], vals_t, ident_t)
    # pad sink + scratch slots with identity
    pad = jnp.broadcast_to(ident_t, (3 * L, Wt, 2))
    buckets_cat = jnp.concatenate([vals_t, pad], axis=2)
    buckets = tuple(
        buckets_cat[c * L : (c + 1) * L] for c in range(3)
    )  # (L, Wt, NB+2) x3

    # --- lane-final leftovers: one row (12MB) transposed ----------------
    fin = acc_stream[rows - 1].T.reshape(3 * L, Wt, cols)
    acc = tuple(fin[c * L : (c + 1) * L] for c in range(3))
    acc_key = keys_arr[rows - 1].reshape(Wt, cols)
    if signed:
        acc_key = acc_key >> 1  # bucket-slot space for the leftover merge
    return buckets, acc, acc_key


# ---------------------------------------------------------------------------
# Monolithic bucket-reduce kernel
#
# sum_b b*S_b per window, decomposed as b = k*C + c:
#   T_w = C * sum_c B_c + sum_c c * A_c,
# with per-lane partials A_c = sum_k S_{k,c} (plain column sums) and
# B_c = sum_k k*S_{k,c} (computed as a running suffix: iterating k from
# K-1 down, run += S_k then B += run — 2 complete adds per bucket, the
# optimal count, with NO HBM round-trips between passes).  The XLA
# roll/select Hillis-Steele composition this replaces spent ~60% of the
# reduce phase moving the (L, Wt, 4096) bucket arrays between passes.
# The small cross-lane combine over C lanes stays in XLA
# (pippenger._bucket_reduce_t).
# ---------------------------------------------------------------------------

REDUCE_C = 256  # lanes per window chunk (K = NB / C sequential rows)
REDUCE_WT = 16  # window tile on sublanes


# ---------------------------------------------------------------------------
# Sequential suffix-reduce kernel: A = sum_k S_k and B = sum_k k*S_k over
# the leading axis of (K, 3L, M) point columns, one kernel launch.  Used
# for the reduce CROSS-LANE COMBINE: the Hillis-Steele suffix + tree +
# doubling XLA composition it replaces cost ~29ms/MSM in point-add kernel
# launches and HBM round-trips on (L, Wt, 256) arrays.
# ---------------------------------------------------------------------------


def _suffix_reduce_kernel(p_ref, np_ref, b3_ref, one_ref, s_ref,
                          a_ref, b_ref, run_ref, bacc_ref):
    L = p_ref.shape[0]
    k = pl.program_id(0)
    K = pl.num_programs(0)
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    b3 = [b3_ref[i, 0] for i in range(L)]
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)
    S = tuple(
        [s_ref[0, c * L + i] for i in range(L)] for c in range(3)
    )

    @pl.when(k == 0)
    def _init():
        zero = jnp.zeros_like(s_ref[0, 0])
        for i in range(L):
            onei = jnp.broadcast_to(one_ref[i, 0], zero.shape)
            for ref in (run_ref, bacc_ref):
                ref[i] = zero
                ref[L + i] = onei
                ref[2 * L + i] = zero

    # run = suffix(K-1-k): the index map feeds blocks high-k first
    P1 = tuple([run_ref[c * L + i] for i in range(L)] for c in range(3))
    run = _rcb15(mul, add, sub, b3, P1, S)
    for c in range(3):
        for i in range(L):
            run_ref[c * L + i] = run[c][i]

    @pl.when(k < K - 1)  # suffix(j), j = K-1..1 accumulates into B
    def _accumulate_b():
        PB = tuple(
            [bacc_ref[c * L + i] for i in range(L)] for c in range(3)
        )
        nb = _rcb15(mul, add, sub, b3, PB, run)
        for c in range(3):
            for i in range(L):
                bacc_ref[c * L + i] = nb[c][i]

    @pl.when(k == K - 1)
    def _emit():
        for i in range(3 * L):
            a_ref[i] = run_ref[i]
            b_ref[i] = bacc_ref[i]


def suffix_reduce_kernel(curve, s, interpret: bool = False):
    """s: (K, 3L, M) int32 (M a multiple of 128).  Returns (A, B), each
    (3L, M): A = sum_k s_k, B = sum_k k*s_k (complete point adds).

    Interpret mode is also jitted: eagerly interpreting the in-kernel
    fori bodies is minutes of per-op dispatch even at toy sizes, while
    the jitted interpreted grid is small enough to compile fine (unlike
    the scan kernel's)."""
    return _suffix_reduce_jit(curve, s, interpret)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _suffix_reduce_jit(curve, s, interpret=False):
    return _suffix_reduce_impl(curve, s, interpret)


def _suffix_reduce_impl(curve, s, interpret):
    df = curve.df
    L = df.L
    K, L3, M = s.shape
    assert L3 == 3 * L and M % 128 == 0
    const_spec = pl.BlockSpec(
        (L, 1), lambda k: (0, 0), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (1, 3 * L, M), lambda k, K=K: (K - 1 - k, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (3 * L, M), lambda k: (0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((3 * L, M), jnp.int32)
    one_mont = curve.ops.one_mont.astype(jnp.int32)
    return pl.pallas_call(
        _suffix_reduce_kernel,
        out_shape=(shape, shape),
        grid=(K,),
        in_specs=[const_spec] * 4 + [s_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((3 * L, M), jnp.int32),
            pltpu.VMEM((3 * L, M), jnp.int32),
        ],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        df.p_limbs[:, None], df.nprime_limbs[:, None], curve.b3[:, None],
        one_mont[:, None], s,
    )


# ---------------------------------------------------------------------------
# Monolithic Horner kernel
#
# total = sum_w 2^(WINDOW_BITS * w) S_w via MSB-first Horner.  The XLA
# composition launched 13 point-add kernels per window (12 doublings + 1
# add) on tiny (L, B) arrays — ~0.1ms launch/HBM overhead each, ~29ms of
# the 260ms budget at W=22.  Here the accumulator lives in VMEM scratch
# across a (W,) sequential grid; each step DMAs just its window's (L, B)
# sum block (index-map selected) and runs the doublings as an in-kernel
# fori_loop — one kernel launch total.
# ---------------------------------------------------------------------------


def _horner_kernel(p_ref, np_ref, b3_ref, s_ref, out_ref, tot_ref, *, wbits):
    L = p_ref.shape[0]
    j = pl.program_id(0)
    W = pl.num_programs(0)
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    b3 = [b3_ref[i, 0] for i in range(L)]
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)
    S = tuple(
        [s_ref[0, c * L + i] for i in range(L)] for c in range(3)
    )

    @pl.when(j == 0)
    def _init():
        for c in range(3):
            for i in range(L):
                tot_ref[c * L + i] = S[c][i]

    @pl.when(j > 0)
    def _step():
        # fori_loop here carried 3L arrays through 12 iterations per grid
        # step — measured ~40ms/MSM of loop overhead (252 iterations);
        # unrolled straight-line doublings keep everything in registers
        def dbl(_, t):
            flat = _rcb15(
                mul, add, sub, b3,
                (t[:L], t[L : 2 * L], t[2 * L :]),
                (t[:L], t[L : 2 * L], t[2 * L :]),
            )
            return tuple(flat[0] + flat[1] + flat[2])

        t0 = tuple(tot_ref[i] for i in range(3 * L))
        td = jax.lax.fori_loop(0, wbits, dbl, t0, unroll=True)
        nxt = _rcb15(
            mul, add, sub, b3,
            (list(td[:L]), list(td[L : 2 * L]), list(td[2 * L :])),
            S,
        )
        for c in range(3):
            for i in range(L):
                tot_ref[c * L + i] = nxt[c][i]

    @pl.when(j == W - 1)
    def _emit():
        for i in range(3 * L):
            out_ref[i] = tot_ref[i]


def horner_kernel(curve, sums, W: int, interpret: bool = False):
    """Window combine on transposed sums.  sums: (L, W*B) x3 window-major
    (window w, batch b at column w*B + b).  Returns (L, B) x3.
    Interpret mode is jitted too (see suffix_reduce_kernel)."""
    return _horner_kernel_jit(curve, sums, W, interpret)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _horner_kernel_jit(curve, sums, W, interpret=False):
    return _horner_impl(curve, sums, W, interpret)


def _horner_impl(curve, sums, W, interpret):
    from davinci_tpu.fields import LIMB_BITS

    df = curve.df
    L = df.L
    WB = sums[0].shape[1]
    B = WB // W
    Bp = -(-B // 128) * 128
    # (L, W*B) x3 -> (W, 3L, Bp): window on the major axis so each grid
    # step's BlockSpec fetches one window's block; MSB-first order.
    # Coordinate-major rows (X limbs, then Y, then Z) match the kernel's
    # s_ref[0, c*L + i] reads.
    arr = jnp.concatenate(sums, axis=0).reshape(3 * L, W, B)
    arr = jnp.swapaxes(arr, 0, 1)  # (W, 3L, B)
    if Bp != B:
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, Bp - B)))
    arr = arr[::-1]  # grid step j consumes window W-1-j

    const_spec = pl.BlockSpec(
        (L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (1, 3 * L, Bp), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (3 * L, Bp), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_horner_kernel, wbits=LIMB_BITS),
        out_shape=jax.ShapeDtypeStruct((3 * L, Bp), jnp.int32),
        grid=(W,),
        in_specs=[const_spec] * 3 + [s_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((3 * L, Bp), jnp.int32)],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        df.p_limbs[:, None], df.nprime_limbs[:, None], curve.b3[:, None], arr
    )
    return tuple(out[c * L : (c + 1) * L, :B] for c in range(3))

# Mosaic's default scoped-VMEM check is 16 MiB; the reduce kernel's
# 6 double-buffered output blocks + 2 projective scratch accumulators
# total ~17 MiB at (wt=16, C=256), which OOMs the driver's v5e run
# (BENCH_r02).  The chip has 128 MiB of VMEM — raise the limit rather
# than shrink the tile (smaller tiles measured slower end-to-end).
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _reduce_kernel(p_ref, np_ref, b3_ref, one_ref, sx_ref, sy_ref, sz_ref,
                   ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
                   run_ref, bacc_ref):
    L = p_ref.shape[0]
    k = pl.program_id(1)
    K = pl.num_programs(1)
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    b3 = [b3_ref[i, 0] for i in range(L)]
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)
    S = tuple([r[i] for i in range(L)] for r in (sx_ref, sy_ref, sz_ref))

    @pl.when(k == 0)
    def _init():
        zero = jnp.zeros_like(sx_ref[0])
        for i in range(L):
            onei = jnp.broadcast_to(one_ref[i, 0], zero.shape)
            for ref in (run_ref, bacc_ref):
                ref[i] = zero
                ref[L + i] = onei
                ref[2 * L + i] = zero

    # run = suffix(K-1-k): the input index map feeds blocks high-k first
    P1 = tuple([run_ref[c * L + i] for i in range(L)] for c in range(3))
    run = _rcb15(mul, add, sub, b3, P1, S)
    for c in range(3):
        for i in range(L):
            run_ref[c * L + i] = run[c][i]

    @pl.when(k < K - 1)  # suffix(j) for j = K-1 .. 1 accumulates into B
    def _accumulate_b():
        PB = tuple(
            [bacc_ref[c * L + i] for i in range(L)] for c in range(3)
        )
        nb = _rcb15(mul, add, sub, b3, PB, run)
        for c in range(3):
            for i in range(L):
                bacc_ref[c * L + i] = nb[c][i]

    @pl.when(k == K - 1)
    def _emit():
        for i in range(L):
            ax_ref[i] = run_ref[i]
            ay_ref[i] = run_ref[L + i]
            az_ref[i] = run_ref[2 * L + i]
            bx_ref[i] = bacc_ref[i]
            by_ref[i] = bacc_ref[L + i]
            bz_ref[i] = bacc_ref[2 * L + i]


def bucket_reduce_kernel(curve, buckets, interpret=False):
    """Per-lane reduce partials for (L, Wt, NB) x3 bucket arrays (sink and
    scratch slots already stripped; NB a power of two).

    Returns (A, B): (L, Wt, C) x3 each with
      T_w = C * sum_c B[:, w, c] + sum_c c * A[:, w, c].
    The caller performs that small cross-lane combine (width C) with the
    existing XLA suffix/tree passes."""
    if interpret:
        return _bucket_reduce_impl(curve, buckets, True)
    return _bucket_reduce_kernel_jit(curve, buckets)


@functools.partial(jax.jit, static_argnums=0)
def _bucket_reduce_kernel_jit(curve, buckets):
    return _bucket_reduce_impl(curve, buckets, False)


def _bucket_reduce_impl(curve, buckets, interpret):
    df = curve.df
    L = df.L
    Lb, Wt, NB = buckets[0].shape
    assert Lb == L and NB & (NB - 1) == 0
    C = REDUCE_C if NB % REDUCE_C == 0 else NB
    K = NB // C
    wt = min(REDUCE_WT, Wt)
    if Wt % wt:
        one = curve.ops.one_mont.astype(jnp.int32)
        pad_n = wt - Wt % wt
        zero = jnp.zeros((L, pad_n, NB), jnp.int32)
        onep = jnp.broadcast_to(one[:, None, None], (L, pad_n, NB))
        buckets = (
            jnp.concatenate([buckets[0], zero], axis=1),
            jnp.concatenate([buckets[1], onep], axis=1),
            jnp.concatenate([buckets[2], zero], axis=1),
        )
    Wp = buckets[0].shape[1]
    grid = (Wp // wt, K)
    const_spec = pl.BlockSpec(
        (L, 1), lambda t, k: (0, 0), memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(
        (L, wt, C),
        lambda t, k, K=K: (0, t, K - 1 - k),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (L, wt, C), lambda t, k: (0, t, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, Wp, C), jnp.int32)
    one_mont = curve.ops.one_mont.astype(jnp.int32)
    outs = pl.pallas_call(
        _reduce_kernel,
        out_shape=(shape,) * 6,
        grid=grid,
        in_specs=[const_spec] * 4 + [in_spec] * 3,
        out_specs=(out_spec,) * 6,
        scratch_shapes=[
            pltpu.VMEM((3 * L, wt, C), jnp.int32),
            pltpu.VMEM((3 * L, wt, C), jnp.int32),
        ],
        compiler_params=None if interpret else _VMEM_LIMIT,
        interpret=interpret,
    )(
        df.p_limbs[:, None], df.nprime_limbs[:, None], curve.b3[:, None],
        one_mont[:, None], *buckets,
    )
    A = tuple(o[:, :Wt] for o in outs[:3])
    B = tuple(o[:, :Wt] for o in outs[3:])
    return A, B
