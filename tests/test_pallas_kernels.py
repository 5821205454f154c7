"""Pallas kernels in interpreter mode (slow; gated — they are exercised
compiled on real TPU by bench.py and the MSM pipeline)."""

import os
import random

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="interpret-mode kernel runs are slow; set RUN_SLOW_TESTS=1",
)


def test_pallas_mont_mul_interpret():
    from davinci_tpu import fields as F
    from davinci_tpu.ff import get_device_field
    from davinci_tpu.ff.pallas_mul import mont_mul

    spec = F.bn254_fr
    df = get_device_field(spec)
    r = random.Random(1)
    xs = [r.randrange(spec.p) for _ in range(8)]
    ys = [r.randrange(spec.p) for _ in range(8)]
    out = mont_mul(df, df.encode(xs), df.encode(ys), interpret=True)
    assert df.decode(out) == [x * y % spec.p for x, y in zip(xs, ys)]


def test_pallas_point_add_interpret():
    from davinci_tpu import curves as C
    from davinci_tpu.ec import get_device_curve
    from davinci_tpu.ec.pallas_add import point_add

    spec = C.bn254_g1
    dc = get_device_curve(spec)
    r = random.Random(2)
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(2)]
    qts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(2)]
    P = dc.encode_points(pts)
    Q = dc.encode_points(qts)
    got = dc.decode_points(point_add(dc, P, Q, interpret=True))
    assert all(g == p.add(q) for g, p, q in zip(got, pts, qts))
