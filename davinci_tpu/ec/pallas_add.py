"""Pallas TPU kernel: fused complete point addition (RCB15, a=0).

One kernel evaluates the entire 12M complete-addition formula with all
intermediate field elements living in VMEM/registers — the jnp composition
materializes every intermediate in HBM (the dominant cost at MSM batch
sizes; a single Montgomery mul's convolution gather alone is hundreds of
MB per op at 90k-point batches).

Layout: transposed (L, N) — limbs on sublanes, batch on lanes.  Outputs are
bit-compatible with the jnp path (canonical limbs, values in [0, p)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from davinci_tpu.fields import LIMB_BITS, LIMB_MASK

TILE_N = 512


def _ripple(cols):
    carry = None
    out = []
    for v in cols:
        if carry is not None:
            v = v + carry
        out.append(v & LIMB_MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _conv(u, v, out_len):
    cols = []
    lu, lv = len(u), len(v)
    for k in range(out_len):
        lo = max(0, k - lv + 1)
        hi = min(lu, k + 1)
        acc = None
        for i in range(lo, hi):
            t = u[i] * v[k - i]
            acc = t if acc is None else acc + t
        cols.append(acc if acc is not None else 0)
    return cols


def _make_field_ops(p_cols, np_cols, L):
    def mul(a, b):
        t, _ = _ripple(_conv(a, b, 2 * L))
        m, _ = _ripple(_conv(t[:L], np_cols, L))
        mp = _conv(m, p_cols, 2 * L)
        s, _ = _ripple([tc + mc for tc, mc in zip(t, mp)])
        hi = s[L:]
        d, borrow = _ripple([h - pc for h, pc in zip(hi, p_cols)])
        under = borrow != 0
        return [jnp.where(under, h, dd) for h, dd in zip(hi, d)]

    def add(a, b):
        s, _ = _ripple([x + y for x, y in zip(a, b)])
        d, borrow = _ripple([x - pc for x, pc in zip(s, p_cols)])
        under = borrow != 0
        return [jnp.where(under, x, dd) for x, dd in zip(s, d)]

    def sub(a, b):
        s, _ = _ripple([x - y + pc for x, y, pc in zip(a, b, p_cols)])
        d, borrow = _ripple([x - pc for x, pc in zip(s, p_cols)])
        under = borrow != 0
        return [jnp.where(under, x, dd) for x, dd in zip(s, d)]

    return mul, add, sub


def _rcb15(mul, add, sub, b3, P1, P2):
    """RCB15 Algorithm 7 (a=0, 12M) on per-limb column lists.
    P1/P2: (X, Y, Z) tuples of limb lists; returns (X3, Y3, Z3)."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub(X3, add(t0, t2))
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3, t2)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    t2m = mul(t3, t1)
    X3 = sub(t2m, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return X3, Y3, Z3


def _rcb15_mixed(mul, add, sub, b3, P1, P2a):
    """RCB15 Algorithm 8 (a=0, 13M incl. 2 b3-muls): complete mixed
    addition P1 (projective) + P2 (affine, NOT the identity).  The MSM
    bucket kernel's hot formula — proving-key points are affine, so Z2==1
    drops one general mul and a third of the point-stream traffic."""
    X1, Y1, Z1 = P1
    X2, Y2 = P2a
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = mul(add(X2, Y2), add(X1, Y1))
    t3 = sub(t3, add(t0, t1))
    t4 = add(mul(Y2, Z1), Y1)
    Y3 = add(mul(X2, Z1), X1)
    X3 = add(t0, t0)
    t0 = add(X3, t0)
    t2 = mul(b3, Z1)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = mul(b3, Y3)
    X3 = mul(t4, Y3)
    t2m = mul(t3, t1)
    X3 = sub(t2m, X3)
    Y3 = mul(Y3, t0)
    t1 = mul(t1, Z3)
    Y3 = add(t1, Y3)
    t0 = mul(t0, t3)
    Z3 = mul(Z3, t4)
    Z3 = add(Z3, t0)
    return X3, Y3, Z3


def _point_add_kernel(p_ref, np_ref, b3_ref, x1r, y1r, z1r, x2r, y2r, z2r,
                      x3r, y3r, z3r):
    L = x1r.shape[0]
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    b3 = [b3_ref[i, 0] for i in range(L)]
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)

    X1 = [x1r[i, :] for i in range(L)]
    Y1 = [y1r[i, :] for i in range(L)]
    Z1 = [z1r[i, :] for i in range(L)]
    X2 = [x2r[i, :] for i in range(L)]
    Y2 = [y2r[i, :] for i in range(L)]
    Z2 = [z2r[i, :] for i in range(L)]

    X3, Y3, Z3 = _rcb15(mul, add, sub, b3, (X1, Y1, Z1), (X2, Y2, Z2))

    for i in range(L):
        x3r[i, :] = X3[i]
        y3r[i, :] = Y3[i]
        z3r[i, :] = Z3[i]


@functools.partial(jax.jit, static_argnums=(0, 10))
def _point_add_pallas(L, p_limbs, np_limbs, b3_limbs, x1, y1, z1, x2, y2, z2,
                      interpret=False):
    n = x1.shape[1]
    grid = (n // TILE_N,)
    const_spec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((L, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((L, n), jnp.int32)
    return pl.pallas_call(
        _point_add_kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[const_spec] * 3 + [data_spec] * 6,
        out_specs=(data_spec, data_spec, data_spec),
        interpret=interpret,
    )(
        p_limbs[:, None], np_limbs[:, None], b3_limbs[:, None],
        x1, y1, z1, x2, y2, z2,
    )


def point_add_t(curve, p, q, interpret=False):
    """Fused complete addition on TRANSPOSED (L, N) coordinate layout —
    the MSM pipeline's native layout (limbs on sublanes, batch on lanes).
    Skips the (N, L) <-> (L, N) transposes of `point_add`, which dominate
    its cost at bucket-array batch sizes (measured via the jax profiler:
    the transposes around each reduce-phase call outweighed the adds)."""
    df = curve.df
    L = df.L
    n = p[0].shape[1]
    n_pad = -(-n // TILE_N) * TILE_N
    flat = [a for a in (*p, *q)]
    if n_pad != n:
        flat = [jnp.pad(a, ((0, 0), (0, n_pad - n))) for a in flat]
    x3, y3, z3 = _point_add_pallas(
        L, df.p_limbs, df.nprime_limbs, curve.b3, *flat, interpret
    )
    if n_pad != n:
        return tuple(a[:, :n] for a in (x3, y3, z3))
    return (x3, y3, z3)


def point_add(curve, p, q, interpret=False):
    """Fused complete addition; p, q: (X, Y, Z) with shape (..., L)."""
    df = curve.df
    L = df.L
    shape = p[0].shape
    flat = [a.reshape(-1, L) for a in (*p, *q)]
    n = flat[0].shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        flat = [jnp.pad(a, ((0, n_pad - n), (0, 0))) for a in flat]
    flat_t = [a.T for a in flat]
    x3, y3, z3 = _point_add_pallas(
        L, df.p_limbs, df.nprime_limbs, curve.b3, *flat_t, interpret
    )
    return tuple(a.T[:n].reshape(shape) for a in (x3, y3, z3))


# ---------------------------------------------------------------------------
# Fp2 (G2) variant — coordinates are component pairs stacked on the limb
# axis: one (2L, N) block per coordinate.  An Fp2 mul is Karatsuba over the
# base-field column ops (4 base muls; 3 when the nonresidue is -1), so the
# whole RCB15 formula still runs VMEM-resident — the jnp Fp2 path's HBM
# intermediates made the G2 proving-key MSM ~25x the G1 kernel cost
# (measured 17.4 s for a 2^18 G2 MSM vs 0.26 s G1).
# ---------------------------------------------------------------------------

TILE_N2 = 256


def _make_fp2_ops(p_cols, np_cols, nr_cols, nr_is_m1, L):
    mul, add, sub = _make_field_ops(p_cols, np_cols, L)

    def add2(a, b):
        return (add(a[0], b[0]), add(a[1], b[1]))

    def sub2(a, b):
        return (sub(a[0], b[0]), sub(a[1], b[1]))

    def mul2(a, b):
        a0, a1 = a
        b0, b1 = b
        t0 = mul(a0, b0)
        t1 = mul(a1, b1)
        mid = mul(add(a0, a1), add(b0, b1))
        c1 = sub(sub(mid, t0), t1)
        if nr_is_m1:
            c0 = sub(t0, t1)
        else:
            c0 = add(t0, mul(nr_cols, t1))
        return (c0, c1)

    return mul2, add2, sub2


def _point_add2_kernel(nr_flag, p_ref, np_ref, nr_ref, b3_ref,
                       x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    L = p_ref.shape[0]
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]
    nr_cols = [nr_ref[i, 0] for i in range(L)]
    b3 = ([b3_ref[i, 0] for i in range(L)],
          [b3_ref[L + i, 0] for i in range(L)])
    mul2, add2, sub2 = _make_fp2_ops(p_cols, np_cols, nr_cols, nr_flag, L)

    def rd(ref):
        return ([ref[i, :] for i in range(L)],
                [ref[L + i, :] for i in range(L)])

    P1 = (rd(x1r), rd(y1r), rd(z1r))
    P2 = (rd(x2r), rd(y2r), rd(z2r))
    X3, Y3, Z3 = _rcb15(mul2, add2, sub2, b3, P1, P2)
    for out_ref, (c0, c1) in zip((x3r, y3r, z3r), (X3, Y3, Z3)):
        for i in range(L):
            out_ref[i, :] = c0[i]
            out_ref[L + i, :] = c1[i]


@functools.partial(jax.jit, static_argnums=(0, 1, 12))
def _point_add2_pallas(L, nr_is_m1, p_limbs, np_limbs, nr_limbs, b3_limbs,
                       x1, y1, z1, x2, y2, z2, interpret=False):
    n = x1.shape[1]
    grid = (n // TILE_N2,)
    const1 = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    const2 = pl.BlockSpec((2 * L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    data = pl.BlockSpec((2 * L, TILE_N2), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((2 * L, n), jnp.int32)
    kernel = functools.partial(_point_add2_kernel, nr_is_m1)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[const1] * 3 + [const2] + [data] * 6,
        out_specs=(data, data, data),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        p_limbs[:, None], np_limbs[:, None], nr_limbs[:, None],
        b3_limbs.reshape(2 * L)[:, None],
        x1, y1, z1, x2, y2, z2,
    )


def point_add_fp2(curve, p, q, interpret=False):
    """Fused complete Fp2 addition; p, q: (X, Y, Z) shaped (..., 2, L)."""
    ops = curve.ops
    df = ops.df
    L = df.L
    shape = p[0].shape
    flat = [a.reshape(-1, 2 * L) for a in (*p, *q)]
    n = flat[0].shape[0]
    n_pad = -(-n // TILE_N2) * TILE_N2
    if n_pad != n:
        flat = [jnp.pad(a, ((0, n_pad - n), (0, 0))) for a in flat]
    flat_t = [a.T for a in flat]
    nr_is_m1 = ops.nr % df.spec.p == df.spec.p - 1
    x3, y3, z3 = _point_add2_pallas(
        L, nr_is_m1, df.p_limbs, df.nprime_limbs, ops.nr_mont, curve.b3,
        *flat_t, interpret,
    )
    return tuple(
        a.T[:n].reshape(shape) for a in (x3, y3, z3)
    )
