"""Pallas TPU kernel: fused batched Montgomery multiplication.

The jnp composition of mul (convolution + three carry normalisations +
conditional subtract) is ~60 separate XLA ops with HBM traffic between
them; this kernel runs the whole pipeline in one VMEM-resident pass per
batch tile — schoolbook limb convolution and *sequential in-register*
carry chains (loop overhead is free inside a kernel, unlike at the XLA op
level).

Layout: transposed (L, N) — limbs on sublanes, batch on lanes — so every
limb op is a full-width (TILE_N,) lane vector.

Used on TPU backends; the jnp path remains the reference implementation
and the CPU/interpret fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from davinci_tpu.fields import LIMB_BITS, LIMB_MASK

TILE_N = 512  # batch lanes per grid step


def _mont_mul_kernel(p_ref, np_ref, a_ref, b_ref, out_ref):
    """One tile: out = REDC(a*b), inputs/outputs (L, TILE_N) transposed."""
    L = a_ref.shape[0]

    a_cols = [a_ref[i, :] for i in range(L)]
    b_cols = [b_ref[i, :] for i in range(L)]
    p_cols = [p_ref[i, 0] for i in range(L)]
    np_cols = [np_ref[i, 0] for i in range(L)]

    def conv_cols(u_cols, v_cols, out_len, v_scalar=False):
        cols = []
        lu, lv = len(u_cols), len(v_cols)
        for kcol in range(out_len):
            lo = max(0, kcol - lv + 1)
            hi = min(lu, kcol + 1)
            acc = None
            for i in range(lo, hi):
                term = u_cols[i] * v_cols[kcol - i]
                acc = term if acc is None else acc + term
            cols.append(acc if acc is not None else 0)
        return cols

    def ripple(cols):
        carry = None
        out = []
        for v in cols:
            if carry is not None:
                v = v + carry
            out.append(v & LIMB_MASK)
            carry = v >> LIMB_BITS
        return out, carry

    # t = a*b (2L columns), carry-normalised
    t, _ = ripple(conv_cols(a_cols, b_cols, 2 * L))
    # m = (t mod R) * n' mod R
    m, _ = ripple(conv_cols(t[:L], np_cols, L))
    # s = (t + m*p) / R
    mp = conv_cols(m, p_cols, 2 * L)
    s, _ = ripple([tc + mc for tc, mc in zip(t, mp)])
    hi = s[L:]
    # conditional subtract p (ripple borrow)
    d, borrow = ripple([h - pc for h, pc in zip(hi, p_cols)])
    under = borrow != 0
    for i in range(L):
        out_ref[i, :] = jnp.where(under, hi[i], d[i])


@functools.partial(jax.jit, static_argnums=(0, 4))
def mont_mul_pallas(L, p_limbs, np_limbs, ab, interpret=False):
    """ab: stacked (2, L, N) int32 transposed (a, b); returns (L, N)."""
    a, b = ab[0], ab[1]
    n = a.shape[1]
    grid = (n // TILE_N,)
    return pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, TILE_N), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(p_limbs[:, None], np_limbs[:, None], a, b)


def mont_mul(df, a, b, interpret=False):
    """Batched Montgomery mul via the Pallas kernel; shapes (..., L).
    Pads the flattened batch to a TILE_N multiple."""
    shape = a.shape
    L = df.L
    a2 = a.reshape(-1, L)
    b2 = jnp.broadcast_to(b, shape).reshape(-1, L)
    n = a2.shape[0]
    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
        b2 = jnp.pad(b2, ((0, n_pad - n), (0, 0)))
    out = mont_mul_pallas(
        L, df.p_limbs, df.nprime_limbs, jnp.stack([a2.T, b2.T]), interpret
    )
    return out.T[:n].reshape(shape)
