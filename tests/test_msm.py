"""MSM vs host oracle, single-device and sharded over the virtual mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import msm, msm_host_input, sharded_msm
from davinci_tpu.msm.pippenger import scalars_to_limbs


def _host_msm(spec, pts, scalars):
    acc = spec.infinity()
    for p, s in zip(pts, scalars):
        acc = acc.add(p.mul(s))
    return acc


@pytest.mark.parametrize("n", [1, 5, 64])
def test_msm_bn254(n):
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    r = random.Random(100 + n)
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]
    # include edge scalars
    if n >= 5:
        scalars[0] = 0
        scalars[1] = 1
        scalars[2] = spec.r - 1
    got = msm_host_input(dc, pts, scalars)
    want = _host_msm(spec, pts, scalars)
    assert got == want


def test_msm_bls377():
    spec = C.bls377_g1
    dc = get_device_curve(spec)
    r = random.Random(7)
    n = 16
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]
    got = msm_host_input(dc, pts, scalars)
    want = _host_msm(spec, pts, scalars)
    assert got == want


def test_sharded_msm_matches():
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    devs = jax.devices()
    assert len(devs) == 8, "conftest should provide 8 virtual cpu devices"
    mesh = jax.sharding.Mesh(np.array(devs), ("shard",))

    r = random.Random(21)
    n = 64
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]

    P = dc.encode_points(pts)
    S = scalars_to_limbs(spec, scalars)
    out = sharded_msm(dc, P, jnp.asarray(S), mesh)
    got = dc.decode_points(tuple(a[None] for a in out))[0]
    want = _host_msm(spec, pts, scalars)
    assert got == want
