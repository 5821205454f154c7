"""Batched short-Weierstrass point arithmetic on device (a=0 curves).

TPU-first design: points are structure-of-arrays (X, Y, Z) projective limb
tensors of shape (..., L); every group operation is a fixed branchless
sequence of batched field ops, so huge batches of point additions vectorize
across the VPU lanes.  Completeness (no doubling/identity special cases)
comes from the Renes–Costello–Batina 2015 complete-addition formulas
(Algorithm 7, a=0, 12M), which is what makes MSM's data-dependent
accumulation patterns expressible as uniform SPMD code — the idiomatic
replacement for the per-point branchy Jacobian code gnark-crypto uses on CPU
(reference prover hot path, SURVEY.md §2.3).

All Weierstrass curves in the stack (BN254, BLS12-377, BW6-761, BLS12-381,
secp256k1) have a=0, so one code path serves them all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS
from davinci_tpu.ff import get_device_field


class DeviceCurve:
    """Batched projective point ops for a CurveSpec whose coordinate field is
    a prime field (G1 curves; BW6 G2 also qualifies).

    A point batch is a tuple (X, Y, Z) of (..., L) int32 Montgomery limb
    arrays.  Identity is (0, 1, 0) (in Montgomery form).
    """

    def __init__(self, spec):
        assert hasattr(spec.fld, "p"), "DeviceCurve needs a prime-field curve"
        self.spec = spec
        self.df = get_device_field(spec.field_spec)
        b = spec.b_ff.v
        self.b3 = self.df.encode_scalar(3 * b % spec.field_spec.p)
        self.add = jax.jit(self.add)
        self.double = jax.jit(self.double)
        self.scalar_mul = jax.jit(self.scalar_mul)

    # -- encoding -----------------------------------------------------------

    def identity(self, shape=()) -> tuple:
        L = self.df.L
        x = jnp.zeros(shape + (L,), jnp.int32)
        y = jnp.broadcast_to(self.df.one_mont, shape + (L,))
        z = jnp.zeros(shape + (L,), jnp.int32)
        return (x, y, z)

    def encode_points(self, pts) -> tuple:
        """List of host AffinePoints -> (X, Y, Z) batch (Montgomery)."""
        xs, ys, zs = [], [], []
        for pt in pts:
            if pt.infinity:
                xs.append(0)
                ys.append(1)
                zs.append(0)
            else:
                xs.append(pt.x.v)
                ys.append(pt.y.v)
                zs.append(1)
        return (self.df.encode(xs), self.df.encode(ys), self.df.encode(zs))

    def decode_points(self, p) -> list:
        """(X, Y, Z) batch -> list of host AffinePoints."""
        from davinci_tpu.curves import AffinePoint

        X = self.df.decode(p[0])
        Y = self.df.decode(p[1])
        Z = self.df.decode(p[2])
        out = []
        fld = self.spec.fld
        for x, y, z in zip(X, Y, Z):
            if z == 0:
                out.append(AffinePoint(self.spec, None, None))
            else:
                zi = pow(z, -1, fld.p)
                out.append(
                    AffinePoint(self.spec, fld(x * zi), fld(y * zi))
                )
        return out

    # -- group ops (branchless, batched) ------------------------------------

    def add(self, p, q):
        """Complete projective addition, RCB15 Algorithm 7 (a=0, 12M)."""
        f = self.df
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        b3 = jnp.broadcast_to(self.b3, X1.shape)

        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))
        X3 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
        Y3 = f.sub(X3, f.add(t0, t2))
        X3 = f.add(t0, t0)
        t0 = f.add(X3, t0)
        t2 = f.mul(b3, t2)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = f.mul(b3, Y3)
        X3 = f.mul(t4, Y3)
        t2 = f.mul(t3, t1)
        X3 = f.sub(t2, X3)
        Y3 = f.mul(Y3, t0)
        t1 = f.mul(t1, Z3)
        Y3 = f.add(t1, Y3)
        t0 = f.mul(t0, t3)
        Z3 = f.mul(Z3, t4)
        Z3 = f.add(Z3, t0)
        return (X3, Y3, Z3)

    def double(self, p):
        return self.add(p, p)

    def neg(self, p):
        X, Y, Z = p
        return (X, self.df.neg(Y), Z)

    def select(self, cond, p, q):
        """cond ? p : q, cond shaped like the batch dims."""
        c = cond[..., None]
        return tuple(jnp.where(c, a, b) for a, b in zip(p, q))

    def scalar_mul(self, p, scalar_limbs, nbits: int | None = None):
        """Batched double-and-add: scalar_limbs is the *raw* (non-Montgomery)
        base-2^LIMB_BITS limb array of the scalars, shape (..., Ls)."""
        if nbits is None:
            nbits = self.spec.r.bit_length()

        acc = self.identity(p[0].shape[:-1])

        def body_dyn(j, state):
            acc, base = state
            limb_idx = j // LIMB_BITS
            bit_idx = j % LIMB_BITS
            limb = jnp.take_along_axis(
                scalar_limbs,
                jnp.broadcast_to(
                    limb_idx, scalar_limbs.shape[:-1] + (1,)
                ),
                axis=-1,
            )[..., 0]
            bit = (limb >> bit_idx) & 1
            added = self.add(acc, base)
            acc = self.select(bit == 1, added, acc)
            base = self.double(base)
            return acc, base

        acc, _ = jax.lax.fori_loop(0, nbits, body_dyn, (acc, p))
        return acc

    # -- affine conversion (batched inversion) ------------------------------

    def to_affine(self, p):
        """(X,Y,Z) -> (x, y, is_inf) with x,y affine Montgomery limbs.
        Uses batched Fermat inversion; infinity maps to (0, 0, True)."""
        f = self.df
        X, Y, Z = p
        zinv = f.inv(Z)  # inv(0) = 0 by construction
        x = f.mul(X, zinv)
        y = f.mul(Y, zinv)
        inf = f.is_zero(Z)
        return x, y, inf


@functools.cache
def get_device_curve(spec) -> DeviceCurve:
    return DeviceCurve(spec)
