"""Batched modular (Montgomery) arithmetic on limb vectors — the device
compute layer every curve/MSM/NTT/hash kernel sits on.

Design (TPU-first, not a port):
  * A field element is a vector of `L` limbs of `LIMB_BITS` (=12) bits held in
    int32, least-significant first.  All ops are *batched*: arrays have shape
    (..., L) and every operation is elementwise over the leading dims, so the
    VPU's 8x128 lanes are filled by the batch dimension, not the limb
    dimension.
  * 12-bit limbs keep every partial product (24 bits) plus an accumulation of
    up to 64 terms (6 bits) inside signed int32 — no int64 anywhere, which is
    what XLA:TPU vectorizes well.
  * Multiplication is Montgomery: full schoolbook convolution (statically
    unrolled over limbs — XLA fuses the L multiply-adds), carry
    normalisation, REDC with -p^{-1} mod R, and a final conditional subtract.
  * Carries are propagated with a lax.scan along the limb axis (signed-safe:
    arithmetic right shift doubles as borrow propagation).  A log-depth
    carry-lookahead variant exists for the non-negative case and is used on
    the mul path.

Replaces (in role, not in code) the gnark-crypto hand-written x86-64
Montgomery assembly used by the reference at every prover step
(reference prover/prover_cpu.go:40).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS, LIMB_MASK, FieldSpec

# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------


def carry_scan_c(cols: jnp.ndarray, n_out: int):
    """Exact carry/borrow propagation along the last axis via lax.scan.

    `cols` holds signed per-limb column sums (|col| < 2^30).  Returns
    (limbs, final_carry): canonical limbs in [0, 2^LIMB_BITS) of length
    `n_out` and the signed carry out of the top processed limb.  The final
    carry doubles as a comparison verdict: propagating (a - b) yields
    carry < 0 iff a < b.
    """
    k = cols.shape[-1]
    x = jnp.moveaxis(cols, -1, 0)  # (k, ...)

    def step(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK  # arithmetic shift: borrow-safe

    fc, limbs = jax.lax.scan(step, jnp.zeros(x.shape[1:], jnp.int32), x)
    limbs = jnp.moveaxis(limbs, 0, -1)
    if n_out > k:
        pad = [(0, 0)] * (limbs.ndim - 1) + [(0, n_out - k)]
        limbs = jnp.pad(limbs, pad)
    return limbs[..., :n_out], fc


def carry_scan(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    return carry_scan_c(cols, n_out)[0]


def carry_log(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Log-depth carry propagation for *non-negative* columns < 2^31.

    Three vectorized shift-add passes reduce limb values to [0, 2^LIMB_BITS],
    after which carries are in {0,1} and a generate/propagate carry-lookahead
    (associative_scan) finishes exactly.
    """
    x = cols
    if x.shape[-1] < n_out:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n_out - x.shape[-1])]
        x = jnp.pad(x, pad)
    x = x[..., :n_out]

    def shift_pass(v):
        lo = v & LIMB_MASK
        hi = v >> LIMB_BITS
        hi = jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1
        )
        return lo + hi

    # value bounds: 2^31 -> ~2^19 -> 4223 -> 4096
    x = shift_pass(shift_pass(shift_pass(x)))
    # now x[i] in [0, 4096]: carry out is 1 iff x[i]+carry_in > LIMB_MASK
    g = (x > LIMB_MASK).astype(jnp.int32)   # generate
    p = (x == LIMB_MASK).astype(jnp.int32)  # propagate

    def combine(a, b):
        ga, pa = a
        gb, pb = b
        return gb | (pb & ga), pb & pa

    gs, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    carry_in = jnp.concatenate(
        [jnp.zeros_like(gs[..., :1]), gs[..., :-1]], axis=-1
    )
    return (x + carry_in) & LIMB_MASK


# ---------------------------------------------------------------------------
# Convolutions (schoolbook limb products, statically unrolled)
# ---------------------------------------------------------------------------


def conv_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product columns: out[..., k] = sum_{i+j=k} a_i * b_j, length 2L-1
    padded to 2L.  Columns < L * (2^12-1)^2 < 2^31 for L <= 64."""
    l = a.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (2 * l,), jnp.int32)
    for i in range(l):
        out = out.at[..., i : i + l].add(a[..., i : i + 1] * b)
    return out


def conv_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lower half product columns: out[..., k] = sum_{i+j=k, k<L} a_i*b_j."""
    l = a.shape[-1]
    out = jnp.zeros(a.shape[:-1] + (l,), jnp.int32)
    for i in range(l):
        out = out.at[..., i:].add(a[..., i : i + 1] * b[..., : l - i])
    return out


# ---------------------------------------------------------------------------
# DeviceField
# ---------------------------------------------------------------------------


class DeviceField:
    """Batched Montgomery field arithmetic for one FieldSpec.

    Values are (..., L) int32 limb arrays in Montgomery form (x*R mod p)
    unless a function says otherwise.  All methods are jit-safe and batched.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.num_limbs
        self.p_limbs = jnp.asarray(spec.to_limbs_unreduced(spec.p))
        self.nprime_limbs = jnp.asarray(spec.to_limbs_unreduced(spec.n_prime))
        self.zero = jnp.zeros(self.L, jnp.int32)
        self.one_mont = jnp.asarray(spec.to_limbs(spec.r_mod_p))
        self.r2 = jnp.asarray(spec.to_limbs(spec.r2_mod_p))
        # jit the public API: shapes recur, so the per-shape compile cache
        # turns eager limb-op dispatch into single fused executables.
        for name in ("mul", "square", "add", "sub", "neg", "double", "inv",
                     "to_mont", "from_mont"):
            setattr(self, name, jax.jit(getattr(self, name)))
        self.pow_const = jax.jit(self.pow_const, static_argnums=1)

    # -- host boundary ------------------------------------------------------

    def encode(self, xs) -> jnp.ndarray:
        """list[int] (normal form) -> (n, L) device array in Montgomery form."""
        return jnp.asarray(
            self.spec.batch_to_limbs([x * self.spec.r % self.spec.p for x in xs])
        )

    def encode_scalar(self, x: int) -> jnp.ndarray:
        return jnp.asarray(self.spec.to_limbs(x * self.spec.r % self.spec.p))

    def decode(self, arr) -> list[int]:
        """(..., L) Montgomery limbs -> list of ints in normal form."""
        rinv = pow(self.spec.r, -1, self.spec.p)
        return [
            x * rinv % self.spec.p for x in self.spec.batch_from_limbs(np.asarray(arr))
        ]

    # -- non-Montgomery (raw residue) boundary ------------------------------

    def encode_raw(self, xs) -> jnp.ndarray:
        """list[int] -> limbs WITHOUT Montgomery scaling (for scalars fed to
        MSM windows etc., where we need plain bit decompositions)."""
        return jnp.asarray(self.spec.batch_to_limbs(xs))

    def to_mont(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Raw residue limbs -> Montgomery form (one REDC with R^2)."""
        return self.mul(raw, jnp.broadcast_to(self.r2, raw.shape))

    def from_mont(self, mont: jnp.ndarray) -> jnp.ndarray:
        """Montgomery limbs -> raw residue limbs (REDC with 1)."""
        l = self.L
        t = jnp.concatenate(
            [mont, jnp.zeros(mont.shape[:-1] + (l,), jnp.int32)], axis=-1
        )
        return self._redc(t)

    # -- core ops -----------------------------------------------------------

    def _csub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) as canonical limbs -> x mod p.  One borrow scan gives
        both the difference and the underflow verdict."""
        d, fc = carry_scan_c(x - self.p_limbs, self.L)
        return jnp.where((fc < 0)[..., None], x, d)

    def _lt(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Lexicographic a < b over canonical limbs, batched -> (...,) bool."""
        _, fc = carry_scan_c(a - b, a.shape[-1])
        return fc < 0

    def _redc(self, t: jnp.ndarray) -> jnp.ndarray:
        """Montgomery reduction of a canonical 2L-limb value t < R*p."""
        l = self.L
        t_lo = t[..., :l]
        m_cols = conv_low(t_lo, jnp.broadcast_to(self.nprime_limbs, t_lo.shape))
        m = carry_scan(m_cols, l)
        mp = conv_full(m, jnp.broadcast_to(self.p_limbs, m.shape))
        # t + m*p ≡ 0 mod R: low L limbs vanish after carry propagation and
        # (t + m*p)/R < 2p < R, so 2L limbs suffice.
        s = carry_scan(t + mp, 2 * l)
        return self._csub_p(s[..., l:])

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: (a*b*R^{-1}) mod p."""
        a, b = jnp.broadcast_arrays(a, b)
        t = carry_scan(conv_full(a, b), 2 * self.L)
        return self._redc(t)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # a + b < 2p < R (>= 6 bits of headroom), so L limbs suffice.
        return self._csub_p(carry_scan(a + b, self.L))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s = carry_scan(a - b + self.p_limbs, self.L + 1)
        return self._csub_p(s[..., : self.L])

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        s = carry_scan(self.p_limbs - a, self.L)
        # p - a == p when a == 0 -> csub brings it to 0
        return self._csub_p(s)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray):
        """cond ? a : b, cond shaped (...,)."""
        return jnp.where(cond[..., None], a, b)

    # -- powering / inversion ----------------------------------------------

    def pow_const(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a host-known exponent, via fori_loop square-and-multiply
        (keeps the XLA graph one-mul-sized)."""
        if e == 0:
            return jnp.broadcast_to(self.one_mont, a.shape)
        nbits = e.bit_length()
        bits = jnp.asarray(
            [(e >> i) & 1 for i in range(nbits)], jnp.int32
        )  # LSB first

        def body(i, state):
            acc, base = state
            bit = bits[i]
            acc = jnp.where(bit[..., None] == 1, self.mul(acc, base), acc)
            base = self.square(base)
            return acc, base

        acc0 = jnp.broadcast_to(self.one_mont, a.shape)
        acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, a))
        return acc

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Batched inversion via Fermat (a^{p-2}); inv(0) returns 0."""
        return self.pow_const(a, self.spec.p - 2)


@functools.cache
def get_device_field(spec: FieldSpec) -> DeviceField:
    return DeviceField(spec)
