"""Batched short-Weierstrass point arithmetic on device (a=0 curves),
generic over the coordinate field backend (Fp limb vectors or Fp2 pairs).

TPU-first design: points are structure-of-arrays (X, Y, Z) projective
tensors; every group operation is a fixed branchless sequence of batched
field ops, so huge batches of point additions vectorize across the VPU
lanes.  Completeness (no doubling/identity special cases) comes from the
Renes–Costello–Batina 2015 complete-addition formulas (Algorithm 7, a=0,
12M), which is what makes MSM's data-dependent accumulation patterns
expressible as uniform SPMD code — the idiomatic replacement for the
per-point branchy Jacobian code gnark-crypto uses on CPU (reference prover
hot path, SURVEY.md §2.3).

All Weierstrass curves in the stack (BN254, BLS12-377, BW6-761, BLS12-381,
secp256k1 — G1 and G2) have a=0, so one code path serves them all; G2
curves over Fp2 just swap in the DeviceQuadExt backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu.fields import LIMB_BITS
from davinci_tpu.ff import get_device_field
from davinci_tpu.ff.quad import DeviceQuadExt, get_device_quad

# DeviceField elements are (..., L); make its backend interface explicit
from davinci_tpu.ff.mod import DeviceField

DeviceField.coord_ndim = 1


class DeviceCurve:
    """Batched projective point ops for a CurveSpec.

    A point batch is a tuple (X, Y, Z) of Montgomery limb arrays shaped
    (..., L) for prime fields or (..., 2, L) for Fp2.
    Identity is (0, 1, 0).
    """

    def __init__(self, spec):
        self.spec = spec
        fld = spec.fld
        if hasattr(fld, "p"):  # prime field
            self.ops = get_device_field(spec.field_spec)
            self.df = self.ops
            b = spec.b_ff.v
            self.b3 = self.ops.encode_scalar(3 * b % spec.field_spec.p)
        else:  # QuadExt over a prime field
            self.ops = get_device_quad(spec.field_spec, fld.nr)
            self.df = self.ops.df
            b0, b1 = spec.b_ff.v
            p = spec.field_spec.p
            self.b3 = jnp.stack(
                [
                    self.df.encode_scalar(3 * b0 % p),
                    self.df.encode_scalar(3 * b1 % p),
                ]
            )
        self._eshape = (2, self.df.L) if self.ops.coord_ndim == 2 else (self.df.L,)
        # On TPU, point additions run as one fused Pallas kernel (the jnp
        # composition's HBM intermediates dominate at MSM batch sizes —
        # measured ~9x for G1, ~25x for Fp2 G2); CPU uses the jnp path.
        self._pallas_add = jax.default_backend() == "tpu"
        self.add = jax.jit(self.add)
        self.double = jax.jit(self.double)
        self.scalar_mul = jax.jit(self.scalar_mul)

    # -- encoding -----------------------------------------------------------

    def identity(self, shape=()) -> tuple:
        x = jnp.zeros(shape + self._eshape, jnp.int32)
        y = jnp.broadcast_to(self.ops.one_mont, shape + self._eshape)
        z = jnp.zeros(shape + self._eshape, jnp.int32)
        return (x, y, z)

    def _enc_coord_list(self, vals):
        """vals: list of field values (int or (c0,c1) tuple) -> array."""
        if self.ops.coord_ndim == 1:
            return self.df.encode(vals)
        return self.ops.encode(vals)

    def encode_points(self, pts) -> tuple:
        """List of host AffinePoints -> (X, Y, Z) batch (Montgomery)."""
        one = 1 if self.ops.coord_ndim == 1 else (1, 0)
        zero = 0 if self.ops.coord_ndim == 1 else (0, 0)
        xs, ys, zs = [], [], []
        for pt in pts:
            if pt.infinity:
                xs.append(zero)
                ys.append(one)
                zs.append(zero)
            else:
                xs.append(pt.x.v)
                ys.append(pt.y.v)
                zs.append(one)
        return (
            self._enc_coord_list(xs),
            self._enc_coord_list(ys),
            self._enc_coord_list(zs),
        )

    def decode_points(self, p) -> list:
        """(X, Y, Z) batch -> list of host AffinePoints."""
        from davinci_tpu.curves import AffinePoint
        from davinci_tpu.towers import FF

        fld = self.spec.fld
        if self.ops.coord_ndim == 1:
            X = self.df.decode(p[0])
            Y = self.df.decode(p[1])
            Z = self.df.decode(p[2])
            mk = lambda v: fld(v)
            inv = lambda z: pow(z, -1, fld.p)
            is0 = lambda z: z == 0
            mulc = lambda v, zi: fld(v * zi)
        else:
            X = self.ops.decode(p[0])
            Y = self.ops.decode(p[1])
            Z = self.ops.decode(p[2])
            mk = lambda v: FF(fld, v)
            is0 = lambda z: z == (0, 0)

        out = []
        for x, y, z in zip(X, Y, Z):
            if is0(z):
                out.append(AffinePoint(self.spec, None, None))
            elif self.ops.coord_ndim == 1:
                zi = pow(z, -1, fld.p)
                out.append(AffinePoint(self.spec, fld(x * zi), fld(y * zi)))
            else:
                zf = FF(fld, z)
                zi = zf.inv()
                out.append(
                    AffinePoint(self.spec, FF(fld, x) * zi, FF(fld, y) * zi)
                )
        return out

    # -- group ops (branchless, batched) ------------------------------------

    def add(self, p, q):
        """Complete projective addition, RCB15 Algorithm 7 (a=0, 12M)."""
        if self._pallas_add:
            from davinci_tpu.ec.pallas_add import point_add, point_add_fp2

            px, qx = jnp.broadcast_arrays(p[0], q[0])
            py, qy = jnp.broadcast_arrays(p[1], q[1])
            pz, qz = jnp.broadcast_arrays(p[2], q[2])
            fn = point_add_fp2 if self.ops.coord_ndim == 2 else point_add
            return fn(self, (px, py, pz), (qx, qy, qz))
        f = self.ops
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
        return (X, self.ops.neg(Y), Z)

    def select(self, cond, p, q):
        """cond ? p : q, cond shaped like the batch dims."""
        return tuple(self.ops.select(cond, a, b) for a, b in zip(p, q))

    def batch_shape(self, p):
        return p[0].shape[: p[0].ndim - self.ops.coord_ndim]

    def scalar_mul(self, p, scalar_limbs, nbits: int | None = None):
        """Batched double-and-add: scalar_limbs is the *raw* (non-Montgomery)
        base-2^LIMB_BITS limb array of the scalars, shape (..., Ls)."""
        if nbits is None:
            nbits = self.spec.r.bit_length()

        acc = self.identity(self.batch_shape(p))

        def body_dyn(j, state):
            acc, base = state
            limb_idx = j // LIMB_BITS
            bit_idx = j % LIMB_BITS
            limb = jnp.take_along_axis(
                scalar_limbs,
                jnp.broadcast_to(limb_idx, scalar_limbs.shape[:-1] + (1,)),
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
        """(X,Y,Z) -> (x, y, is_inf) with x,y affine Montgomery limbs
        (Fermat inversion on Fp; norm-based on Fp2)."""
        f = self.ops
        X, Y, Z = p
        zinv = f.inv(Z)  # inv(0) = 0 by construction
        x = f.mul(X, zinv)
        y = f.mul(Y, zinv)
        inf = f.is_zero(Z)
        return x, y, inf

    def affine_encoding(self, p):
        """(X,Y,Z) batch -> the MSM affine-input encoding: x/y affine
        Montgomery limbs and z in {0, one_mont} flagging infinity —
        what encode_points produces, straight from device arrays."""
        x, y, inf = self.to_affine(p)
        infc = (
            inf[..., None] if self.ops.coord_ndim == 1 else inf[..., None, None]
        )
        zero = jnp.zeros_like(x)
        one = jnp.broadcast_to(self.ops.one_mont, x.shape)
        return (
            jnp.where(infc, zero, x),
            jnp.where(infc, self.ops.one_mont, y),
            jnp.where(infc, zero, one),
        )


@functools.cache
def get_device_curve(spec) -> DeviceCurve:
    return DeviceCurve(spec)
