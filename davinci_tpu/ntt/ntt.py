"""Number-theoretic transform (radix-2) over SNARK scalar fields.

Role: the quotient-polynomial FFTs inside Groth16 proving — replaces
gnark-crypto's fft package (used by every groth16.Prove in the reference,
SURVEY.md §2.3 "radix-2 FFT").

Design: iterative Cooley-Tukey DIT with a host-precomputed bit-reversal
permutation and per-stage *statically strided* twiddle slices (no gathers).
Stages are a Python loop (log n instantiations of one batched field mul —
compile-friendly); all data stays (..., n, L) int32 Montgomery limbs, so
batches of polynomials vectorize across the VPU.

Coset evaluation/interpolation (for the quotient h = (a*b - c)/Z_H) uses
device-built power tables (log-depth doubling construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.ff import get_device_field


def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int32)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class DeviceNTT:
    def __init__(self, spec):
        self.spec = spec
        self.df = get_device_field(spec)

    @functools.lru_cache(maxsize=None)
    def _roots(self, logn: int):
        """(omega, omega_inv, n_inv) as host ints for a 2^logn domain."""
        w = self.spec.root_of_unity(logn)
        winv = pow(w, -1, self.spec.p)
        ninv = pow(1 << logn, -1, self.spec.p)
        return w, winv, ninv

    def power_table(self, g: int, n: int) -> jnp.ndarray:
        """[1, g, g^2, ..., g^(n-1)] as (n, L) Montgomery limbs, built on
        device with log2(n) batched muls."""
        df = self.df
        p = jnp.stack([df.one_mont, df.encode_scalar(g)])
        cur = g * g % self.spec.p
        while p.shape[0] < n:
            shift = df.encode_scalar(cur)
            p = jnp.concatenate([p, df.mul(p, shift[None, :])])
            cur = cur * cur % self.spec.p
        return p[:n]

    def _butterflies(self, x: jnp.ndarray, wpow: jnp.ndarray, n: int):
        """DIT butterflies on bit-reversed input; wpow = powers of omega,
        (n/2, L)."""
        df = self.df
        logn = n.bit_length() - 1
        lead = x.shape[:-2]
        for s in range(logn):
            m = 1 << s
            step = n // (2 * m)
            w = wpow[::step][:m]  # (m, L) static strided slice
            xr = x.reshape(lead + (n // (2 * m), 2, m, x.shape[-1]))
            u = xr[..., 0, :, :]
            v = df.mul(xr[..., 1, :, :], w)
            x = jnp.stack([df.add(u, v), df.sub(u, v)], axis=-3).reshape(
                lead + (n, x.shape[-1])
            )
        return x

    @functools.partial(jax.jit, static_argnums=0)
    def _ntt_jit(self, x, rev, wpow):
        n = x.shape[-2]
        x = jnp.take(x, rev, axis=-2)
        return self._butterflies(x, wpow, n)

    @functools.partial(jax.jit, static_argnums=0)
    def _intt_jit(self, x, rev, wpow_inv, ninv_mont):
        n = x.shape[-2]
        x = jnp.take(x, rev, axis=-2)
        x = self._butterflies(x, wpow_inv, n)
        return self.df.mul(x, ninv_mont)

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward NTT: coefficients -> evaluations on the 2^k domain.
        x: (..., n, L) Montgomery limbs."""
        n = x.shape[-2]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        w, _, _ = self._roots(logn)
        rev = jnp.asarray(_bitrev_perm(n))
        wpow = self.power_table(w, n // 2) if n > 1 else self.df.one_mont[None]
        return self._ntt_jit(x, rev, wpow)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse NTT: evaluations -> coefficients."""
        n = x.shape[-2]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        _, winv, ninv = self._roots(logn)
        rev = jnp.asarray(_bitrev_perm(n))
        wpow = self.power_table(winv, n // 2) if n > 1 else self.df.one_mont[None]
        ninv_mont = self.df.encode_scalar(ninv)
        return self._intt_jit(x, rev, wpow, ninv_mont)

    # -- explicit-root transforms -------------------------------------------
    # Some domains fix their own generator convention (EIP-4844 uses
    # PRIMITIVE_ROOT=7, not the field's generic 2-adic generator —
    # blobs/kzg.py _domain); mixing conventions breaks brp-domain
    # consistency, so these take omega explicitly.

    def ntt_with_root(self, x: jnp.ndarray, w: int) -> jnp.ndarray:
        n = x.shape[-2]
        assert pow(w, n, self.spec.p) == 1
        rev = jnp.asarray(_bitrev_perm(n))
        wpow = self.power_table(w, n // 2) if n > 1 else self.df.one_mont[None]
        return self._ntt_jit(x, rev, wpow)

    def intt_with_root(self, x: jnp.ndarray, w: int) -> jnp.ndarray:
        n = x.shape[-2]
        winv = pow(w, -1, self.spec.p)
        ninv = pow(n, -1, self.spec.p)
        rev = jnp.asarray(_bitrev_perm(n))
        wpow = (
            self.power_table(winv, n // 2) if n > 1 else self.df.one_mont[None]
        )
        return self._intt_jit(x, rev, wpow, self.df.encode_scalar(ninv))

    # -- coset helpers (quotient polynomial) --------------------------------

    def coset_ntt(self, coeffs: jnp.ndarray, g: int | None = None):
        """Evaluate on the coset g*H: scale coeff_i by g^i then NTT."""
        n = coeffs.shape[-2]
        if g is None:
            g = self.spec.multiplicative_generator
        gp = self.power_table(g, n)
        return self.ntt(self.df.mul(coeffs, gp))

    def coset_intt(self, evals: jnp.ndarray, g: int | None = None):
        """Interpolate from coset evaluations: iNTT then scale by g^-i."""
        n = evals.shape[-2]
        if g is None:
            g = self.spec.multiplicative_generator
        ginv = pow(g, -1, self.spec.p)
        gp = self.power_table(ginv, n)
        return self.df.mul(self.intt(evals), gp)


@functools.cache
def get_device_ntt(spec) -> DeviceNTT:
    return DeviceNTT(spec)
