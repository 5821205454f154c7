"""Device G2 (Fp2 backend) ops vs host oracle."""

import random

import jax.numpy as jnp
import pytest

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import msm
from davinci_tpu.msm.pippenger import scalars_to_limbs


@pytest.mark.parametrize("spec", [C.bn254_g2, C.bls377_g2], ids=lambda c: c.name)
def test_g2_add_scalar_mul(spec):
    dc = get_device_curve(spec)
    r = random.Random(31)
    ks = [r.randrange(1, spec.r) for _ in range(3)]
    pts = [spec.gen.mul(k) for k in ks]
    P = dc.encode_points(pts)
    got = dc.decode_points(dc.add(P, P))
    for g, p in zip(got, pts):
        assert g == p.double()

    scalars = [5, 1, r.randrange(spec.r)]
    S = jnp.asarray(scalars_to_limbs(spec, scalars))
    got = dc.decode_points(dc.scalar_mul(P, S))
    for g, p, k in zip(got, pts, scalars):
        assert g == p.mul(k)


def test_g2_msm():
    spec = C.bn254_g2
    dc = get_device_curve(spec)
    r = random.Random(32)
    n = 8
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]
    out = msm(dc, dc.encode_points(pts), jnp.asarray(scalars_to_limbs(spec, scalars)))
    got = dc.decode_points(tuple(a[None] for a in out))[0]
    want = spec.infinity()
    for p, s in zip(pts, scalars):
        want = want.add(p.mul(s))
    assert got == want
