"""Device witness reduction: (A z, B z, C z) mod r computed ON the TPU
from a device-resident CSR of the constraint matrices and the packed
witness upload — replaces the host numpy-object-bignum `matvec_all`
(0.7-0.9 s of every 100k-constraint prove; ~60 s at the 8M-constraint
full-size vote verifier) and the 3x (N, L) host->device coefficient
uploads that followed it.

Role parity: gnark's solver evaluation inside Prove (reference prover
hot loop, SURVEY §3.2) — here as an XLA program (SURVEY §2.3 "witness
solver as XLA program").

Scheme per matrix: terms (var, coeff_id, row) with a small dictionary of
distinct coefficients (circuits reuse few: powers of two, small ints,
p-k).  For each term the 22x22 base-2^12 limb convolution of
coeff x z[var] lands in 43 int32 columns (products < 2^24, column sums
< 2^29), scatter-added per row into an int64 accumulator (< 2^55 even
at 50M terms), then each row's redundant columns are carry-propagated
and folded mod r with two constant multiplications:

    v = g0 + 2^264 g1 + 2^528 g2   (Montgomery, on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS

_CHUNK = 1 << 19  # terms per scatter step: bounds transient conv memory


class DeviceCSR:
    """Device-resident constraint matrices for matvec_device.

    Built once per circuit structure (cached on the constraint system by
    Groth16.prove); reusable across proves because the structure is
    witness-independent."""

    def __init__(self, mats, r: int, L: int):
        self.r = r
        self.L = L
        self.parts = []
        for idx, coeff, offs in mats:
            T = len(idx)
            rows = np.repeat(
                np.arange(len(offs) - 1, dtype=np.int32),
                np.diff(offs).astype(np.int64),
            )
            table: dict = {0: 0}
            ids = np.empty(T, np.int32)
            for i, c in enumerate(coeff):
                ci = int(c)
                t = table.get(ci)
                if t is None:
                    t = table[ci] = len(table)
                ids[i] = t
            tl = np.zeros((len(table), L), np.int32)
            mask = (1 << LIMB_BITS) - 1
            for c, tid in table.items():
                v = c % r
                for j in range(L):
                    tl[tid, j] = (v >> (LIMB_BITS * j)) & mask
            # pad T to the chunk multiple; padding scatters coeff 0 into a
            # sink row
            Tp = -(-max(T, 1) // _CHUNK) * _CHUNK
            vi = np.zeros(Tp, np.int32)
            vi[:T] = idx.astype(np.int32)
            ci_a = np.zeros(Tp, np.int32)
            ci_a[:T] = ids
            ri = np.full(Tp, len(offs) - 1, np.int32)  # sink row
            ri[:T] = rows
            # HOST-resident: the term arrays are ~1 GB at full-size c2;
            # keeping them on device across proves exhausted HBM on the
            # second prove (16 GB chip also holds PK bases + NTT
            # intermediates).  jit device_puts them transiently per call.
            self.parts.append((vi, ci_a, ri, tl))


@functools.partial(jax.jit, static_argnums=(4, 5))
def _accumulate(var_idx, coeff_ids, row_ids, table_limbs, n_rows: int,
                L: int, Z_limbs):
    """Scatter-add the per-term limb convolutions into (n_rows+1, 2L-1)
    int64 row accumulators (slot n_rows = padding sink)."""
    K = 2 * L - 1
    T = var_idx.shape[0]
    n_chunks = T // _CHUNK

    def body(k, acc):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, k * _CHUNK, _CHUNK)
        zl = Z_limbs[sl(var_idx)]  # (C, L) int32 < 2^12
        cl = table_limbs[sl(coeff_ids)]  # (C, L) int32 < 2^12
        out = jnp.zeros((_CHUNK, K), jnp.int32)
        for i in range(L):
            out = out.at[:, i : i + L].add(cl[:, i : i + 1] * zl)
        return acc.at[sl(row_ids)].add(out.astype(jnp.int64))

    acc = jnp.zeros((n_rows + 1, K), jnp.int64)
    return jax.lax.fori_loop(0, n_chunks, body, acc)


@jax.jit
def _carry_cols(acc):
    """(N, 2L-1) int64 redundant columns -> (N, 2L+5) int32 base-2^12
    limbs (x64 scope: columns reach ~2^51 on million-term rows)."""
    K = acc.shape[1]
    EXTRA = 6  # carry drain: max column < 2^55, 55/12 < 5 extra limbs
    limbs = []
    carry = jnp.zeros_like(acc[:, 0])
    for c in range(K + EXTRA):
        cur = carry + (acc[:, c] if c < K else 0)
        limbs.append((cur & ((1 << LIMB_BITS) - 1)).astype(jnp.int32))
        carry = cur >> LIMB_BITS
    return jnp.stack(limbs, axis=1)


@functools.partial(jax.jit, static_argnums=(0,))
def _fold_mont(df, Lb, c1m, c2m):
    """(N, 2L+5) int32 base-2^12 limbs -> (N, L) Montgomery residues."""
    L = df.L
    g0 = Lb[:, :L]
    g1 = Lb[:, L : 2 * L]
    g2 = Lb[:, 2 * L :]
    g2 = jnp.pad(g2, ((0, 0), (0, L - g2.shape[1])))
    # to_mont accepts raw < 2^(12L) (t = raw * r2 < R*r keeps REDC exact)
    v = df.add(df.to_mont(g0), df.mul(df.to_mont(g1), c1m))
    return df.add(v, df.mul(df.to_mont(g2), c2m))


def matvec_device(df, dcsr: DeviceCSR, Z_limbs, N: int):
    """(A z, B z, C z) as (N, L) Montgomery device arrays (rows past the
    constraint count are zero, matching the quotient-domain layout).

    Runs under scoped x64: the row accumulators NEED real int64 — a
    single constraint row can hold millions of terms (the lookup
    finalize identity), so int32 column sums overflow.  Without the
    scope, jnp silently truncates the accumulator dtype to int32."""
    r, L = dcsr.r, dcsr.L
    c1m = df.encode_scalar(pow(2, LIMB_BITS * L, r))
    c2m = df.encode_scalar(pow(2, 2 * LIMB_BITS * L, r))
    out = []
    for vi, ci, ri, tl in dcsr.parts:
        # x64 ONLY around the int64 accumulation/carry (the field kernels
        # stay int32; scoping keeps their traces untouched)
        with jax.enable_x64(True):
            acc = _accumulate(vi, ci, ri, tl, N, L, Z_limbs)
            Lb = _carry_cols(acc[:N])
            del acc  # (N+1, 43) int64 — free before the next matrix
        out.append(_fold_mont(df, Lb, c1m, c2m))
        del Lb
    return out


@functools.partial(jax.jit, static_argnums=(0, 4))
def satisfied_device(df, az, bz, cz, n_cons: int):
    """all(az*bz == cz) over the first n_cons rows, on device."""
    d = df.sub(df.mul(az[:n_cons], bz[:n_cons]), cz[:n_cons])
    return jnp.all(d == 0)
