"""Array-native MSM point bases for proving keys.

Proving keys hold millions of fixed G1/G2 points; keeping them as host
AffinePoint lists meant every prove re-encoded them into device limb
arrays one Python bignum at a time (the round-1 "Groth16 won't scale"
finding).  EncodedBases stores the device encoding itself — (X, Y, Z)
int32 Montgomery limb arrays in the MSM affine-input contract (z in
{0, one}) — as numpy on the host, uploaded to the device once and cached.

Role parity: gnark's ProvingKey G1/G2 slices (curve-encoded, mmapped by
the reference's artifact cache, circuits/artifacts.go:62-106).
"""

from __future__ import annotations

import numpy as np


class EncodedBases:
    """(X, Y, Z) numpy int32 arrays shaped (n, L) (G1) or (n, 2, L) (G2),
    Montgomery limbs, z in {0, one_mont} per the MSM affine contract."""

    __slots__ = ("x", "y", "z", "_dev", "_dev_padded", "_dev_packed")

    def __init__(self, x, y, z):
        self.x = np.asarray(x, np.int32)
        self.y = np.asarray(y, np.int32)
        self.z = np.asarray(z, np.int32)
        assert self.x.shape == self.y.shape == self.z.shape
        self._dev = None
        self._dev_padded = None
        self._dev_packed = None

    def __len__(self) -> int:
        return self.x.shape[0]

    def device(self) -> tuple:
        """The (X, Y, Z) tuple as device arrays (uploaded once, cached)."""
        if self._dev is None:
            import jax.numpy as jnp

            self._dev = (
                jnp.asarray(self.x),
                jnp.asarray(self.y),
                jnp.asarray(self.z),
            )
        return self._dev

    def device_padded(self, seg: int) -> tuple:
        """Device arrays zero-padded to `seg` rows (uploaded once, cached) —
        the fixed MSM compile shape on TPU."""
        if self._dev_padded is None or self._dev_padded[0].shape[0] != seg:
            import jax.numpy as jnp

            pads = ((0, seg - self.x.shape[0]),) + ((0, 0),) * (
                self.x.ndim - 1
            )
            self._dev_padded = tuple(
                jnp.asarray(np.pad(a, pads)) for a in (self.x, self.y, self.z)
            )
        return self._dev_padded

    def device_packed(self, seg: int, curve) -> tuple:
        """(packed planes, is_inf) of the seg-padded bases for the scan
        kernel's fixed-base fast path (bucket_kernel.pack_points) —
        computed once per PK and reused by every prove (G1 only)."""
        if self._dev_packed is None or self._dev_packed[0].shape[0] != seg:
            from davinci_tpu.msm.pippenger import _pack_points_jit

            self._dev_packed = tuple(
                _pack_points_jit(curve, *self.device_padded(seg))
            )
        return self._dev_packed

    def drop_device(self):
        self._dev = None
        self._dev_padded = None
        self._dev_packed = None

    def __eq__(self, other):
        if not isinstance(other, EncodedBases):
            return NotImplemented
        return (
            np.array_equal(self.x, other.x)
            and np.array_equal(self.y, other.y)
            and np.array_equal(self.z, other.z)
        )

    @classmethod
    def empty(cls, dc) -> "EncodedBases":
        shape = (0, 2, dc.df.L) if dc.ops.coord_ndim == 2 else (0, dc.df.L)
        z = np.zeros(shape, np.int32)
        return cls(z, z, z)

    @classmethod
    def from_host_points(cls, dc, pts) -> "EncodedBases":
        """Host AffinePoints -> encoded bases (slow path: tests/small keys)."""
        if not pts:
            return cls.empty(dc)
        x, y, z = dc.encode_points(pts)
        return cls(np.asarray(x), np.asarray(y), np.asarray(z))

    @classmethod
    def from_device(cls, arrs) -> "EncodedBases":
        return cls(*(np.asarray(a) for a in arrs))

    def to_host_points(self, dc) -> list:
        """Decode back to host AffinePoints (tests only — O(n) bignum)."""
        return dc.decode_points(self.device())
