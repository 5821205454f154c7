"""Batched modular (Montgomery) arithmetic on limb vectors — the device
compute layer every curve/MSM/NTT/hash kernel sits on.

Design (TPU-first, not a port):
  * A field element is a vector of `L` limbs of `LIMB_BITS` (=12) bits held in
    int32, least-significant first.  All ops are *batched*: arrays have shape
    (..., L) and every operation is elementwise over the leading dims, so the
    VPU's lanes are filled by the batch dimension, not the limb dimension.
  * 12-bit limbs keep every partial product (24 bits) plus an accumulation of
    up to 64 terms (6 bits) inside signed int32 — no int64 anywhere.
  * Limb convolution (schoolbook product) is ONE gather + ONE dot_general
    against a precomputed shift-index/mask pair, so a full Montgomery mul is
    a handful of HLO ops.  This keeps XLA graphs small enough that MSM/NTT
    loops instantiating hundreds of point additions still compile fast, and
    it maps onto batched matvecs the TPU backend can tile.
  * Carries ripple via a tiny lax.while_loop (converges in <= 4 passes for
    random data, bounded by L; arithmetic right shift doubles as borrow
    propagation, so signed columns with non-negative totals are handled).

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
# Limb convolution via gather + dot_general
# ---------------------------------------------------------------------------


@functools.cache
def _conv_tables_np(l: int, out: int):
    i = np.arange(l)[:, None]
    k = np.arange(out)[None, :]
    d = k - i
    mask = (d >= 0) & (d < l)
    idx = np.clip(d, 0, l - 1)
    return idx.astype(np.int32), mask.astype(np.int32)


def _conv_tables(l: int, out: int):
    """IDX[i, k] = k - i clipped to [0, l), MASK[i, k] = 1 iff 0 <= k-i < l.
    numpy is cached; jnp conversion happens per call so no tracer leaks."""
    idx, mask = _conv_tables_np(l, out)
    return jnp.asarray(idx), jnp.asarray(mask)


def conv_full(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full product columns: out[..., k] = sum_{i+j=k} a_i * b_j, length 2L.
    Columns < L * (2^12-1)^2 < 2^31 for L <= 64."""
    l = a.shape[-1]
    idx, mask = _conv_tables(l, 2 * l)
    bexp = b[..., idx] * mask  # (..., L, 2L)
    return jnp.einsum(
        "...i,...ik->...k", a, bexp, preferred_element_type=jnp.int32
    )


def conv_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lower half product columns (k < L)."""
    l = a.shape[-1]
    idx, mask = _conv_tables(l, l)
    bexp = b[..., idx] * mask
    return jnp.einsum(
        "...i,...ik->...k", a, bexp, preferred_element_type=jnp.int32
    )


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------


def _shift_pass(v: jnp.ndarray) -> jnp.ndarray:
    lo = v & LIMB_MASK
    hi = v >> LIMB_BITS  # arithmetic shift: borrow-safe
    hi = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
    return lo + hi


def carry_fix(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Exact carry/borrow normalisation of signed column sums (|col| <
    2^30) to canonical limbs; carries beyond n_out are dropped (mod
    2^(12*n_out) semantics — callers arrange the total is >= 0 and in
    range, or explicitly want the wrap).

    Backend-adaptive: on TPU, three vectorized shift passes bound every
    residual carry to {-1, 0, 1} and a 3-state carry-lookahead
    (associative scan of monotone step functions — a generalisation of
    generate/propagate) finishes exactly with zero control flow, keeping
    field ops latency-free.  On CPU (tests), a while_loop ripple is used
    instead: XLA:CPU's compile time on the scan graphs is superlinear and
    dominates test wall-clock, while the ripple compiles instantly and
    runs fine there.
    """
    x = cols
    if x.shape[-1] < n_out:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n_out - x.shape[-1])]
        x = jnp.pad(x, pad)
    x = x[..., :n_out]

    if jax.default_backend() == "cpu":
        def canonical(v):
            return jnp.all((v >> LIMB_BITS) == 0)

        return jax.lax.while_loop(
            lambda v: ~canonical(v), _shift_pass, x
        )

    # bounds: 2^30 -> ~2^18 -> [-128, 4223] -> [-1, 4096]
    x = _shift_pass(_shift_pass(_shift_pass(x)))

    # per-position carry map f(c) = (v + c) >> 12 for c in {-1, 0, 1}
    fm = (x - 1) >> LIMB_BITS
    fz = x >> LIMB_BITS
    fp = (x + 1) >> LIMB_BITS

    def compose(a, b):
        # b after a: (b∘a)(c) = b[a(c)]
        am, az, ap = a
        bm, bz, bp = b

        def idx(v):
            return jnp.where(v < 0, bm, jnp.where(v == 0, bz, bp))

        return idx(am), idx(az), idx(ap)

    sm, sz, sp = jax.lax.associative_scan(compose, (fm, fz, fp), axis=-1)
    # carry into position i = composed map of positions [0, i) applied to 0
    cin = jnp.concatenate([jnp.zeros_like(sz[..., :1]), sz[..., :-1]], axis=-1)
    return (x + cin) & LIMB_MASK


# backwards-compatible exact scan variant (used in tests as a reference)
def carry_scan_c(cols: jnp.ndarray, n_out: int):
    k = cols.shape[-1]
    x = jnp.moveaxis(cols, -1, 0)

    def step(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    fc, limbs = jax.lax.scan(step, jnp.zeros(x.shape[1:], jnp.int32), x)
    limbs = jnp.moveaxis(limbs, 0, -1)
    if n_out > k:
        pad = [(0, 0)] * (limbs.ndim - 1) + [(0, n_out - k)]
        limbs = jnp.pad(limbs, pad)
    return limbs[..., :n_out], fc


def carry_scan(cols: jnp.ndarray, n_out: int) -> jnp.ndarray:
    return carry_scan_c(cols, n_out)[0]


def _sign_of_diff(d: jnp.ndarray) -> jnp.ndarray:
    """Sign of the multi-limb value sum d_i 2^(12 i), given |d_i| small.
    Folds from the most significant limb: first nonzero limb decides.
    Returns (...,) int32 in {-1, 0, 1}."""
    l = d.shape[-1]

    def body(i, acc):
        limb = jax.lax.dynamic_index_in_dim(d, l - 1 - i, axis=-1, keepdims=False)
        s = jnp.sign(limb)
        return jnp.where(acc == 0, s, acc)

    return jax.lax.fori_loop(0, l, body, jnp.zeros(d.shape[:-1], jnp.int32))


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
        """list[int] (normal form) -> (n, L) device array in Montgomery form.
        The Montgomery scaling runs on device (one mul by R^2) — per-element
        host bignum muls were a measurable prove-path cost at 2^17+ sizes."""
        return self.to_mont(jnp.asarray(self.spec.batch_to_limbs(xs)))

    def encode_scalar(self, x: int) -> jnp.ndarray:
        return jnp.asarray(self.spec.to_limbs(x * self.spec.r % self.spec.p))

    def decode(self, arr) -> list[int]:
        """(..., L) Montgomery limbs -> list of ints in normal form (the
        un-scaling REDC runs on device; limb unpack is bytes-vectorized)."""
        return self.spec.batch_from_limbs(np.asarray(self.from_mont(arr)))

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

        def one(m):
            l = self.L
            t = jnp.concatenate(
                [m, jnp.zeros(m.shape[:-1] + (l,), jnp.int32)], axis=-1
            )
            return self._redc(t)

        return self._batched_cap(one, (mont,), self.L)

    # -- core ops -----------------------------------------------------------

    def _csub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) as canonical limbs -> x mod p.

        Branchless: propagate (x - p) over L+1 limbs; the top limb comes out
        0 on no-borrow and 4095 (= wrapped -1) on underflow."""
        l = self.L
        ext = jnp.concatenate(
            [x - self.p_limbs, jnp.zeros(x.shape[:-1] + (1,), jnp.int32)],
            axis=-1,
        )
        d = carry_fix(ext, l + 1)
        borrow = d[..., l] != 0
        return jnp.where(borrow[..., None], x, d[..., :l])

    def _lt(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Lexicographic a < b over canonical limbs, batched -> (...,) bool."""
        l = a.shape[-1]
        ext = jnp.concatenate(
            [a - b, jnp.zeros(a.shape[:-1] + (1,), jnp.int32)], axis=-1
        )
        d = carry_fix(ext, l + 1)
        return d[..., l] != 0

    def _redc(self, t: jnp.ndarray) -> jnp.ndarray:
        """Montgomery reduction of a canonical 2L-limb value t < R*p."""
        l = self.L
        t_lo = t[..., :l]
        m = carry_fix(
            conv_low(t_lo, jnp.broadcast_to(self.nprime_limbs, t_lo.shape)), l
        )
        mp = conv_full(m, jnp.broadcast_to(self.p_limbs, m.shape))
        # t + m*p ≡ 0 mod R: low L limbs vanish after carry propagation and
        # (t + m*p)/R < 2p < R, so 2L limbs suffice.
        s = carry_fix(t + mp, 2 * l)
        return self._csub_p(s[..., l:])

    # The schoolbook conv materializes a (batch, L, 2L) int32 operand
    # (conv_full's bexp).  At quotient-NTT domains (2^23 x L=22 for the
    # full-size vote verifier) that is a 32 GB buffer — over HBM.  Muls
    # whose expanded intermediate would exceed this cap run as a
    # lax.map over fixed power-of-two chunks; smaller shapes keep the
    # exact graph they had (compile caches stay valid).
    _MUL_INTERMED_CAP = 1 << 30  # bytes

    def _mul_chunk(self) -> int:
        per = self.L * 2 * self.L * 4
        c = max(1, self._MUL_INTERMED_CAP // per)
        return max(4096, 1 << (c.bit_length() - 1))

    def _batched_cap(self, fn, arrays, out_last: int):
        """Apply fn (elementwise over the batch axes, last dim = limbs)
        in sequential chunks when the batch is huge."""
        shape = arrays[0].shape[:-1]
        batch = 1
        for d in shape:
            batch *= d
        chunk = self._mul_chunk()
        if batch <= chunk:
            return fn(*arrays)
        flat = [a.reshape(-1, a.shape[-1]) for a in arrays]
        pad = (-batch) % chunk
        if pad:
            flat = [jnp.pad(f, ((0, pad), (0, 0))) for f in flat]
        chunks = [f.reshape(-1, chunk, f.shape[-1]) for f in flat]
        out = jax.lax.map(lambda xs: fn(*xs), tuple(chunks))
        return out.reshape(-1, out_last)[:batch].reshape(
            shape + (out_last,)
        )

    def _mul_direct(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        t = carry_fix(conv_full(a, b), 2 * self.L)
        return self._redc(t)

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: (a*b*R^{-1}) mod p."""
        a, b = jnp.broadcast_arrays(a, b)
        return self._batched_cap(self._mul_direct, (a, b), self.L)

    def square(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        # a + b < 2p < R (>= 6 bits of headroom), so L limbs suffice.
        return self._csub_p(carry_fix(a + b, self.L))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._csub_p(carry_fix(a - b + self.p_limbs, self.L))

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self._csub_p(carry_fix(self.p_limbs - a, self.L))

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
