#!/usr/bin/env python3
"""Experimental point-add kernel variants for TPU tuning (not shipped).

Variants vs the production kernel (davinci_tpu/ec/pallas_add.py):
  v2d   -- (R, 128) 2D per-limb tiles + field constants baked as Python
           ints (constant-folded scalar multiplies)
  lazy  -- v2d + lazy reduction: adds are limb-wise (no carries), subs
           add a dominating multiple of p then re-ripple; muls skip the
           final conditional subtraction (outputs < 2p); one canonical
           pass at the end.

Run: PYTHONPATH=/root/repo python scripts/addk_exp.py [n] [variant...]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from davinci_tpu.fields import LIMB_BITS, LIMB_MASK
from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve

import os

LANES = 128
ROWS = int(os.environ.get("ADDK_ROWS", "8"))  # TILE_N = ROWS * LANES


def digits(v: int, L: int) -> list:
    return [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)]


def _ripple(cols):
    carry = None
    out = []
    for v in cols:
        if carry is not None:
            v = v + carry
        if isinstance(v, int):
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        else:
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
            if (isinstance(u[i], int) and u[i] == 0) or (
                isinstance(v[k - i], int) and v[k - i] == 0
            ):
                continue
            t = u[i] * v[k - i]
            acc = t if acc is None else acc + t
        cols.append(acc if acc is not None else 0)
    return cols


def _make_strict_ops(p_cols, np_cols, L):
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


def _rcb15(mul, add, sub, b3, X1, Y1, Z1, X2, Y2, Z2):
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


def _kernel_v2d(consts, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    p_cols, np_cols, b3 = consts
    L = len(p_cols)
    mul, add, sub = _make_strict_ops(p_cols, np_cols, L)
    u = lambda r: [r[i] for i in range(L)]
    X3, Y3, Z3 = _rcb15(
        mul, add, sub, b3, u(x1r), u(y1r), u(z1r), u(x2r), u(y2r), u(z2r)
    )
    for i in range(L):
        x3r[i] = X3[i]
        y3r[i] = Y3[i]
        z3r[i] = Z3[i]


# --------------------------------------------------------------------- lazy
#
# Bounds discipline (p 254-bit, R = 2^264):
#   mul out: < 2p, canonical 12-bit limbs (no final subtract)
#   add: limb-wise (limbs <= 14 bit), value < sum of bounds
#   sub(a, b, kp_digits): limb-wise a - b + digits(k*p) with k*p >= bound(b),
#     then ripple (value nonneg; limbs transiently negative is fine)
#   mul inputs: value <= 8p and limbs <= 14 bits => conv products
#     2^26..2^28 * 22 < 2^31 requires limbs paired <= (14,12) bits.
#   REDC: T <= 64 p^2 < p*R  (R/p ~ 2^10), out < T/R + p < 2p.


def _make_lazy_ops(p_cols, np_cols, L):
    p_val = sum(c << (LIMB_BITS * i) for i, c in enumerate(p_cols))
    p2 = digits(2 * p_val, L)
    p4 = digits(4 * p_val, L)

    def mul(a, b):
        t, _ = _ripple(_conv(a, b, 2 * L))
        m, _ = _ripple(_conv(t[:L], np_cols, L))
        mp = _conv(m, p_cols, 2 * L)
        s, _ = _ripple([tc + mc for tc, mc in zip(t, mp)])
        return s[L:]  # < 2p, canonical limbs

    def add(a, b):
        return [x + y for x, y in zip(a, b)]

    def sub2(a, b):  # bound(b) <= 2p
        s, _ = _ripple([x - y + c for x, y, c in zip(a, b, p2)])
        return s

    def sub4(a, b):  # bound(b) <= 4p
        s, _ = _ripple([x - y + c for x, y, c in zip(a, b, p4)])
        return s

    def canon(a, bound_mult):  # value < bound_mult * p -> < p
        k = 1 << (max(bound_mult - 1, 1).bit_length() - 1)
        while k >= 1:
            kp = digits(k * p_val, L)
            d, borrow = _ripple([x - c for x, c in zip(a, kp)])
            under = borrow != 0
            a = [jnp.where(under, x, dd) for x, dd in zip(a, d)]
            k >>= 1
        return a

    return mul, add, sub2, sub4, canon


def _kernel_lazy(consts, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    p_cols, np_cols, b3 = consts
    L = len(p_cols)
    mul, add, sub2, sub4, canon = _make_lazy_ops(p_cols, np_cols, L)
    u = lambda r: [r[i] for i in range(L)]
    X1, Y1, Z1 = u(x1r), u(y1r), u(z1r)
    X2, Y2, Z2 = u(x2r), u(y2r), u(z2r)

    t0 = mul(X1, X2)                      # < 2p
    t1 = mul(Y1, Y2)                      # < 2p
    t2 = mul(Z1, Z2)                      # < 2p
    t3 = mul(add(X1, Y1), add(X2, Y2))    # inputs < 2p -> < 2p
    t3 = sub4(t3, add(t0, t1))            # < 2p + 4p = 6p, 12-bit limbs
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub4(t4, add(t1, t2))            # < 6p
    X3 = mul(add(X1, Z1), add(X2, Z2))
    Y3 = sub4(X3, add(t0, t2))            # < 6p
    X3 = add(t0, t0)                      # < 4p, 13-bit limbs
    t0 = add(X3, t0)                      # < 6p, 14-bit limbs
    t2 = mul(b3, t2)                      # b3 const < p -> < 2p
    Z3 = add(t1, t2)                      # < 4p, 13-bit
    t1 = sub2(t1, t2)                     # < 4p, 12-bit
    Y3 = mul(b3, Y3)                      # Y3 < 6p: 6p*p < pR ok -> < 2p
    X3 = mul(t4, Y3)                      # 6p * 2p ok -> < 2p
    t2m = mul(t3, t1)                     # 6p * 4p = 24p^2 ok -> < 2p
    X3 = sub2(t2m, X3)                    # < 6p + 2p... bound: t2m<2p, X3<2p -> < 4p
    Y3 = mul(Y3, t0)                      # 2p * 6p ok
    t1 = mul(t1, Z3)                      # 4p * 4p ok
    Y3 = add(t1, Y3)                      # < 4p, 13-bit
    t0 = mul(t0, t3)                      # 6p * 6p = 36p^2 ok
    Z3 = mul(Z3, t4)                      # 4p * 6p ok
    Z3 = add(Z3, t0)                      # < 4p, 13-bit

    X3 = canon(X3, 4)
    Y3 = canon(Y3, 4)
    Z3 = canon(Z3, 4)
    for i in range(L):
        x3r[i] = X3[i]
        y3r[i] = Y3[i]
        z3r[i] = Z3[i]


def jnp_zero(L):
    return [0] * L


# ----------------------------------------------------------------- addonly
# diagnostic: same dataflow, limb products replaced by adds — measures how
# much of the kernel is int32 multiply cost (NOT correct math).


def _make_addonly_ops(p_cols, np_cols, L):
    def fake_conv(u, v, out_len):
        cols = []
        lu, lv = len(u), len(v)
        for k in range(out_len):
            lo = max(0, k - lv + 1)
            hi = min(lu, k + 1)
            acc = None
            for i in range(lo, hi):
                t = u[i] + (v[k - i] if not isinstance(v[k - i], int) else 1)
                acc = t if acc is None else acc + t
            cols.append(acc if acc is not None else 0)
        return cols

    def mul(a, b):
        t, _ = _ripple(fake_conv(a, b, 2 * L))
        m, _ = _ripple(fake_conv(t[:L], np_cols, L))
        mp = fake_conv(m, p_cols, 2 * L)
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


def _kernel_addonly(consts, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    p_cols, np_cols, b3 = consts
    L = len(p_cols)
    mul, add, sub = _make_addonly_ops(p_cols, np_cols, L)
    u = lambda r: [r[i] for i in range(L)]
    X3, Y3, Z3 = _rcb15(
        mul, add, sub, b3, u(x1r), u(y1r), u(z1r), u(x2r), u(y2r), u(z2r)
    )
    for i in range(L):
        x3r[i] = X3[i]
        y3r[i] = Y3[i]
        z3r[i] = Z3[i]


# -------------------------------------------------------------------- kara
# Karatsuba on the a*b convolution (22 -> 11+11): 3 half-size convs.


def _kara_conv(u, v, L):
    h = L // 2
    u0, u1 = u[:h], u[h:]
    v0, v1 = v[:h], v[h:]
    z0 = _conv(u0, v0, 2 * h)          # deg < 2h
    z2 = _conv(u1, v1, 2 * h)
    us = [a + b for a, b in zip(u0, u1)]
    vs = [a + b for a, b in zip(v0, v1)]
    z1 = _conv(us, vs, 2 * h)          # (u0+u1)(v0+v1); limbs 13-bit -> 2^27.5*11 ok
    mid = [m - a - b for m, a, b in zip(z1, z0, z2)]
    out = [0] * (2 * L)
    for i, c in enumerate(z0):
        out[i] = out[i] + c
    for i, c in enumerate(mid):
        out[h + i] = out[h + i] + c
    for i, c in enumerate(z2):
        out[2 * h + i] = out[2 * h + i] + c
    return out


def _make_kara_ops(p_cols, np_cols, L):
    def mul(a, b):
        t, _ = _ripple(_kara_conv(a, b, L))
        m, _ = _ripple(_conv(t[:L], np_cols, L))
        mp = _conv(m, p_cols, 2 * L)
        s, _ = _ripple([tc + mc for tc, mc in zip(t, mp)])
        hi = s[L:]
        d, borrow = _ripple([h - pc for h, pc in zip(hi, p_cols)])
        under = borrow != 0
        return [jnp.where(under, h, dd) for h, dd in zip(hi, d)]

    _, add, sub = _make_strict_ops(p_cols, np_cols, L)
    return mul, add, sub


def _kernel_kara(consts, x1r, y1r, z1r, x2r, y2r, z2r, x3r, y3r, z3r):
    p_cols, np_cols, b3 = consts
    L = len(p_cols)
    mul, add, sub = _make_kara_ops(p_cols, np_cols, L)
    u = lambda r: [r[i] for i in range(L)]
    X3, Y3, Z3 = _rcb15(
        mul, add, sub, b3, u(x1r), u(y1r), u(z1r), u(x2r), u(y2r), u(z2r)
    )
    for i in range(L):
        x3r[i] = X3[i]
        y3r[i] = Y3[i]
        z3r[i] = Z3[i]


KERNELS = {
    "v2d": _kernel_v2d,
    "lazy": _kernel_lazy,
    "addonly": _kernel_addonly,
    "kara": _kernel_kara,
}


@functools.partial(jax.jit, static_argnums=(0, 1))
def _add_2d(variant, consts, x1, y1, z1, x2, y2, z2):
    L = len(consts[0])
    n = x1.shape[1]
    resh = lambda a: a.reshape(L, n // LANES, LANES)
    grid = (n // (ROWS * LANES),)
    data_spec = pl.BlockSpec(
        (L, ROWS, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((L, n // LANES, LANES), jnp.int32)
    kern = functools.partial(KERNELS[variant], consts)
    out = pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        grid=grid,
        in_specs=[data_spec] * 6,
        out_specs=(data_spec, data_spec, data_spec),
    )(resh(x1), resh(y1), resh(z1), resh(x2), resh(y2), resh(z2))
    return tuple(a.reshape(L, n) for a in out)


def run_variant(name, dc, a, b, pts, n, iters=30):
    df = dc.df
    L = df.L
    consts = (
        tuple(int(x) for x in np.asarray(df.p_limbs)),
        tuple(int(x) for x in np.asarray(df.nprime_limbs)),
        tuple(int(x) for x in np.asarray(dc.b3)),
    )
    at = tuple(x.T for x in a)
    bt = tuple(x.T for x in b)

    out = _add_2d(name, consts, *at, *bt)
    jax.block_until_ready(out)
    if name != "addonly":
        got = dc.decode_points(tuple(x.T[:1] for x in out))[0]
        want = pts[0].add(pts[64 - 7])
        assert got == want, (name, got, want)

    t0 = time.time()
    for _ in range(iters):
        out = _add_2d(name, consts, *out, *bt)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name}: n={n}  {n / dt / 1e6:.3f}M adds/s  {dt * 1e3:.3f} ms", flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 22 * 2048
    variants = sys.argv[2:] or ["v2d", "lazy"]
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    rng = np.random.default_rng(0)
    pts = [spec.gen.mul(int(k)) for k in rng.integers(1, 2**31, size=64)]
    P = dc.encode_points(pts)
    reps = n // 64
    a = tuple(jnp.tile(x, (reps, 1)) for x in P)
    b = tuple(jnp.roll(jnp.tile(x, (reps, 1)), 7, axis=0) for x in P)

    for v in variants:
        try:
            run_variant(v, dc, a, b, pts, n)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
