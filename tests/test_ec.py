"""Device curve ops vs host oracle; host curve self-consistency."""

import random

import numpy as np
import pytest

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve

CURVES = [C.bn254_g1, C.bls377_g1, C.bw6_g1, C.bls381_g1, C.secp256k1]


@pytest.mark.parametrize("spec", CURVES, ids=lambda c: c.name)
def test_device_add_mul(spec):
    dc = get_device_curve(spec)
    r = random.Random(11)
    ks = [r.randrange(1, spec.r) for _ in range(4)]
    pts = [spec.gen.mul(k) for k in ks]
    qs = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(4)]

    P = dc.encode_points(pts)
    Q = dc.encode_points(qs)

    got = dc.decode_points(dc.add(P, Q))
    for g, p, q in zip(got, pts, qs):
        assert g == p.add(q), "add mismatch"

    got_dbl = dc.decode_points(dc.double(P))
    for g, p in zip(got_dbl, pts):
        assert g == p.double(), "double mismatch"

    # complete-addition edge cases: P + (-P) = inf, P + inf = P, inf + inf
    NegP = dc.neg(P)
    got_zero = dc.decode_points(dc.add(P, NegP))
    assert all(g.infinity for g in got_zero)
    I = dc.identity((4,))
    got_id = dc.decode_points(dc.add(P, I))
    for g, p in zip(got_id, pts):
        assert g == p
    assert all(g.infinity for g in dc.decode_points(dc.add(I, I)))


@pytest.mark.parametrize("spec", [C.bn254_g1, C.bls377_g1], ids=lambda c: c.name)
def test_device_scalar_mul(spec):
    dc = get_device_curve(spec)
    r = random.Random(13)
    scalars = [0, 1, 2, spec.r - 1, r.randrange(spec.r)]
    base_pts = [spec.gen] * len(scalars)
    P = dc.encode_points(base_pts)
    import jax.numpy as jnp

    # scalar limbs in the *scalar field's* layout (raw, base 2^12)
    from davinci_tpu.fields import FIELDS

    sf = [f for f in FIELDS.values() if f.p == spec.r]
    assert sf, "no scalar field spec registered"
    sf = sf[0]
    S = jnp.asarray(sf.batch_to_limbs(scalars))
    got = dc.decode_points(dc.scalar_mul(P, S))
    for g, k in zip(got, scalars):
        assert g == spec.gen.mul(k), f"scalar_mul {k}"


def test_to_affine():
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    pts = [spec.gen.mul(k) for k in (5, 7)]
    P = dc.encode_points(pts)
    # force nontrivial Z by adding: P+P
    P2 = dc.add(P, P)
    x, y, inf = dc.to_affine(P2)
    xs = dc.df.decode(x)
    ys = dc.df.decode(y)
    for i, p in enumerate(pts):
        w = p.double()
        assert xs[i] == w.x.v and ys[i] == w.y.v
    assert not any(np.asarray(inf))
