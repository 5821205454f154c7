"""Batched Fp2 arithmetic on device: coordinates are (..., 2, L) int32
Montgomery limb arrays over a base DeviceField.

This is the field backend that puts G2 curves (BN254/BLS12-377/BLS12-381)
on device — required so Groth16 setup/proving's [v_i(tau)]G2 work and the
proof's B point run as batched kernels instead of host bignum loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from davinci_tpu.ff.mod import DeviceField, get_device_field


class DeviceQuadExt:
    """Karatsuba Fp2 = Fp[u]/(u^2 - nr) over a DeviceField.

    Elements: (..., 2, L) arrays (component axis before limbs).
    coord_ndim = 2 (trailing dims that make up one field element).
    """

    coord_ndim = 2

    def __init__(self, df: DeviceField, nr: int):
        self.df = df
        self.nr = nr
        self.nr_mont = df.encode_scalar(nr % df.spec.p)
        self.zero = jnp.zeros((2, df.L), jnp.int32)
        self.one_mont = jnp.stack([df.one_mont, jnp.zeros(df.L, jnp.int32)])

    # -- host boundary -------------------------------------------------------

    def encode(self, xs) -> jnp.ndarray:
        """List of (c0, c1) int tuples -> (n, 2, L) Montgomery limbs."""
        flat = []
        for c0, c1 in xs:
            flat += [c0, c1]
        arr = self.df.encode(flat)
        return arr.reshape(len(xs), 2, self.df.L)

    def decode(self, arr) -> list:
        n = int(arr.reshape(-1, 2, self.df.L).shape[0])
        flat = self.df.decode(arr.reshape(-1, self.df.L))
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(n)]

    # -- ops -----------------------------------------------------------------

    def add(self, a, b):
        return self.df.add(a, b)

    def sub(self, a, b):
        return self.df.sub(a, b)

    def neg(self, a):
        return self.df.neg(a)

    def double(self, a):
        return self.df.add(a, a)

    def mul(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = self.df.mul(a0, b0)
        t1 = self.df.mul(a1, b1)
        mid = self.df.mul(self.df.add(a0, a1), self.df.add(b0, b1))
        c1 = self.df.sub(self.df.sub(mid, t0), t1)
        c0 = self.df.add(t0, self.df.mul(self.nr_mont, t1))
        return jnp.stack([c0, c1], axis=-2)

    def square(self, a):
        return self.mul(a, a)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def inv(self, a):
        """Batched inversion: 1/(a0 + a1 u) = (a0 - a1 u)/(a0^2 - nr a1^2);
        inv(0) = 0 (matches DeviceField.inv's convention)."""
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = self.df.sub(
            self.df.mul(a0, a0),
            self.df.mul(self.nr_mont, self.df.mul(a1, a1)),
        )
        ninv = self.df.inv(norm)
        c0 = self.df.mul(a0, ninv)
        c1 = self.df.neg(self.df.mul(a1, ninv))
        return jnp.stack([c0, c1], axis=-2)


@functools.cache
def get_device_quad(spec, nr: int) -> DeviceQuadExt:
    return DeviceQuadExt(get_device_field(spec), nr)
