"""Number-theoretic transform (radix-2) over SNARK scalar fields.

Role: the quotient-polynomial FFTs inside Groth16 proving — replaces
gnark-crypto's fft package (used by every groth16.Prove in the reference,
SURVEY.md §2.3 "radix-2 FFT").

Design: constant-geometry Stockham DIF — every stage is the SAME graph
(halve, butterfly, twiddle-gather, permutation-gather), so the whole
transform is a lax.fori_loop over one stage instantiation with
host-precomputed (logn, n) permutation and (logn, n/2) twiddle-exponent
tables.  The previous Python-unrolled Cooley-Tukey emitted log2(n) fused
stage graphs: at the 2^18 quotient domain the XLA/AOT compile of that
graph took 10-17 MINUTES per process (measured on the results-verifier
prove), dwarfing the milliseconds of execution.  Natural order in and
out (autosort — no bit-reversal pass).

All data stays (..., n, L) int32 Montgomery limbs, so batches of
polynomials vectorize across the VPU.  Coset evaluation/interpolation
(for the quotient h = (a*b - c)/Z_H) uses device-built power tables
(log-depth doubling construction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.ff import get_device_field


@functools.lru_cache(maxsize=16)
def _stage_tables(n: int):
    """Host-built constant-geometry stage tables for a size-n transform:
    perm (logn, n) int32 — output position i of stage s reads butterfly
    output [b*(n/2) + j*m + t] where i = j*2m + b*m + t, m = 2^s;
    exps (logn, n/2) int32 — twiddle exponents (j*m for flat lane j*m+t)."""
    logn = n.bit_length() - 1
    perm = np.zeros((max(logn, 1), n), np.int32)
    exps = np.zeros((max(logn, 1), max(n // 2, 1)), np.int32)
    i = np.arange(n)
    half = np.arange(n // 2)
    for s in range(logn):
        m = 1 << s
        j, rem = i // (2 * m), i % (2 * m)
        b, t = rem // m, rem % m
        perm[s] = (b * (n // 2) + j * m + t).astype(np.int32)
        exps[s] = ((half // m) * m).astype(np.int32)
    import jax.numpy as _jnp

    return _jnp.asarray(perm), _jnp.asarray(exps)


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

    def _butterflies(self, x: jnp.ndarray, wpow, perm, exps, n: int):
        """Constant-geometry Stockham DIF stages: natural order in/out.
        wpow: (n/2, L) powers of omega; perm/exps: _stage_tables(n)."""
        df = self.df
        logn = n.bit_length() - 1
        half = n // 2

        def stage(s, x):
            u = x[..., :half, :]
            v = x[..., half:, :]
            tw = jnp.take(wpow, exps[s], axis=0)  # (n/2, L)
            z = jnp.concatenate(
                [df.add(u, v), df.mul(tw, df.sub(u, v))], axis=-2
            )
            return jnp.take(z, perm[s], axis=-2)

        return jax.lax.fori_loop(0, logn, stage, x)

    @functools.partial(jax.jit, static_argnums=0)
    def _ntt_jit(self, x, wpow, perm, exps):
        return self._butterflies(x, wpow, perm, exps, x.shape[-2])

    @functools.partial(jax.jit, static_argnums=0)
    def _intt_jit(self, x, wpow_inv, perm, exps, ninv_mont):
        x = self._butterflies(x, wpow_inv, perm, exps, x.shape[-2])
        return self.df.mul(x, ninv_mont)

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Forward NTT: coefficients -> evaluations on the 2^k domain.
        x: (..., n, L) Montgomery limbs."""
        n = x.shape[-2]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        w, _, _ = self._roots(logn)
        perm, exps = _stage_tables(n)
        wpow = self.power_table(w, n // 2) if n > 1 else self.df.one_mont[None]
        return self._ntt_jit(x, wpow, perm, exps)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse NTT: evaluations -> coefficients."""
        n = x.shape[-2]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        _, winv, ninv = self._roots(logn)
        perm, exps = _stage_tables(n)
        wpow = self.power_table(winv, n // 2) if n > 1 else self.df.one_mont[None]
        ninv_mont = self.df.encode_scalar(ninv)
        return self._intt_jit(x, wpow, perm, exps, ninv_mont)

    # -- explicit-root transforms -------------------------------------------
    # Some domains fix their own generator convention (EIP-4844 uses
    # PRIMITIVE_ROOT=7, not the field's generic 2-adic generator —
    # blobs/kzg.py _domain); mixing conventions breaks brp-domain
    # consistency, so these take omega explicitly.

    def ntt_with_root(self, x: jnp.ndarray, w: int) -> jnp.ndarray:
        n = x.shape[-2]
        assert pow(w, n, self.spec.p) == 1
        perm, exps = _stage_tables(n)
        wpow = self.power_table(w, n // 2) if n > 1 else self.df.one_mont[None]
        return self._ntt_jit(x, wpow, perm, exps)

    def intt_with_root(self, x: jnp.ndarray, w: int) -> jnp.ndarray:
        n = x.shape[-2]
        winv = pow(w, -1, self.spec.p)
        ninv = pow(n, -1, self.spec.p)
        perm, exps = _stage_tables(n)
        wpow = (
            self.power_table(winv, n // 2) if n > 1 else self.df.one_mont[None]
        )
        return self._intt_jit(x, wpow, perm, exps, self.df.encode_scalar(ninv))

    # -- sharded transforms (multi-chip) ------------------------------------
    #
    # Bailey four-step NTT over a device mesh axis: (1) all_to_all reshards
    # natural blocks to the strided decomposition (moves n elements over
    # ICI), (2) local length-n/D Stockham transforms, (3) per-device
    # twiddles, (4) the cross-device length-D DFT as D local scaled copies
    # reduced with psum_scatter (moves n elements; output lands in natural
    # blocks).  This is the pod-collective replacement for the quotient
    # NTTs in multi-chip Groth16 proving (SURVEY §2.4: butterfly stages as
    # collectives over ICI, not NCCL point-to-point).

    def _shard_tables(self, n: int, D: int, w: int):
        """Host-precomputed tables for a size-n transform over D devices:
        per-device twiddles (D, n2, L) [w^(b*k2)] and the cross-DFT
        weights (D, D, L) [w^(n2*b*k1)], both Montgomery."""
        df = self.df
        p = self.spec.p
        n2 = n // D
        tw = np.zeros((D, n2, self.df.L), np.int32)
        small = np.zeros((D, D, self.df.L), np.int32)
        for b in range(D):
            wb = pow(w, b, p)
            acc = 1
            vals = []
            for _ in range(n2):
                vals.append(acc * self.spec.r_mod_p % p)
                acc = acc * wb % p
            tw[b] = self.spec.batch_to_limbs(vals)
            wn2b = pow(w, n2 * b, p)
            acc = 1
            vals = []
            for _ in range(D):
                vals.append(acc * self.spec.r_mod_p % p)
                acc = acc * wn2b % p
            small[b] = self.spec.batch_to_limbs(vals)
        return jnp.asarray(tw), jnp.asarray(small)

    def sharded_ntt(self, x: jnp.ndarray, mesh, axis_name: str = "shard",
                    inverse: bool = False) -> jnp.ndarray:
        """Forward (or inverse) NTT of x (n, L) sharded over mesh axis.
        Natural order in and out, bit-identical to ntt()/intt()."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        df = self.df
        n = x.shape[0]
        D = mesh.shape[axis_name]
        n2 = n // D
        assert n2 * D == n and n2 % D == 0, (n, D)
        logn2 = n2.bit_length() - 1
        assert 1 << logn2 == n2
        w, winv, ninv = self._roots(n.bit_length() - 1)
        if inverse:
            w = winv
        tw, small = self._shard_tables(n, D, w)
        # local transforms use root w^D (order n2)
        wD = pow(w, D, self.spec.p)
        perm, exps = _stage_tables(n2)
        wpow = (
            self.power_table(wD, n2 // 2) if n2 > 1 else df.one_mont[None]
        )
        ninv_mont = df.encode_scalar(ninv if inverse else 1)

        def local(xb, twb, smallb):
            # (1) natural blocks -> strided decomposition
            g = xb.reshape(n2 // D, D, -1).transpose(1, 0, 2)
            g = jax.lax.all_to_all(
                g, axis_name, split_axis=0, concat_axis=0
            ).reshape(n2, -1)
            # (2) local Stockham over j2 with root w^D
            a = self._butterflies(g, wpow, perm, exps, n2)
            # (3) per-device twiddle w^(b*k2)
            a = df.mul(a, twb[0])
            # (4) cross-device DFT over b: D scaled copies, psum_scatter
            contrib = df.mul(a[None], smallb[0][:, None, :])  # (D, n2, L)
            out = jax.lax.psum_scatter(
                contrib, axis_name, scatter_dimension=0, tiled=False
            )
            # psum adds limb columns WITHOUT field reduction (value < D*p,
            # limbs < D*4096); one carry pass + Montgomery mul by the
            # (1 or 1/n) constant renormalizes exactly
            from davinci_tpu.ff.mod import carry_fix

            return df.mul(carry_fix(out, df.L), ninv_mont)

        spec_in = P(axis_name)
        kwargs = dict(
            mesh=mesh,
            in_specs=(spec_in, spec_in, spec_in),
            out_specs=spec_in,
        )
        try:
            fn = shard_map(local, check_vma=False, **kwargs)
        except TypeError:
            fn = shard_map(local, check_rep=False, **kwargs)
        return jax.jit(fn)(x, tw, small)

    def sharded_intt(self, x, mesh, axis_name: str = "shard"):
        return self.sharded_ntt(x, mesh, axis_name, inverse=True)

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
