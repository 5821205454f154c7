"""Correctness tests for the PRODUCTION bucket-pipeline MSM path — the code
that produces the bench numbers on TPU (pippenger._bucket_accumulate_fused /
_bucket_reduce_fused / _horner), forced on via DAVINCI_FORCE_PIPELINE_MSM so
the CPU test backend exercises it too, at a shrunken scan width (COLS).

Covers: random scalars, edge scalars (0, 1, r-1), bucket collisions
(repeated scalars), single-device and the 8-device sharded all_gather
bucket-merge path.  Reference role: gnark-crypto MSM correctness tests.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davinci_tpu import curves as C
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import msm, sharded_msm
from davinci_tpu.msm import pippenger as pp
from davinci_tpu.msm.pippenger import scalars_to_limbs


def _host_msm(spec, pts, scalars):
    acc = spec.infinity()
    for p, s in zip(pts, scalars):
        acc = acc.add(p.mul(s))
    return acc


@pytest.fixture
def small_cols(monkeypatch):
    """Shrink the scan width so the fused pipeline compiles quickly on the
    CPU test backend, and force the pipeline branch on."""
    monkeypatch.setenv("DAVINCI_FORCE_PIPELINE_MSM", "1")
    monkeypatch.setattr(pp, "COLS", 64)


def _run_case(spec, scalars, pts):
    dc = get_device_curve(spec)
    P = dc.encode_points(pts)
    S = jnp.asarray(scalars_to_limbs(spec, scalars))
    out = msm(dc, P, S)
    got = dc.decode_points(tuple(a[None] for a in out))[0]
    assert got == _host_msm(spec, pts, scalars)


def test_pipeline_msm_matches_oracle(small_cols):
    spec = C.bn254_g1
    r = random.Random(3101)
    n = 128  # two scan rows at COLS=64: exercises the scan + leftover merge
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = spec.r - 1
    # bucket collisions: a run of equal scalars (same bucket in every window)
    for i in range(8, 24):
        scalars[i] = scalars[8]
    _run_case(spec, scalars, pts)


def test_pipeline_msm_all_equal_buckets(small_cols):
    """All points share one bucket per window — the worst case for the
    segmented-scan emission logic (one giant run spanning all columns)."""
    spec = C.bn254_g1
    r = random.Random(77)
    n = 128
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [12345678901234567890] * n
    _run_case(spec, scalars, pts)


def test_gather_bucket_positions():
    """The scan kernel's gather-based bucket construction derives each
    bucket's tail-piece position from the sorted keys alone.  Check the
    position algebra (cumsum ends, mid-lane predicate) against a direct
    segmented simulation — pure host logic, no kernel needed."""
    import numpy as np

    r = random.Random(5)
    cols, rows, nb = 8, 4, 16
    n = cols * rows
    keys = sorted(r.randrange(nb) for _ in range(n))
    k = np.array(keys)
    counts = np.bincount(k, minlength=nb)
    ends = np.cumsum(counts)
    use = (counts > 0) & (ends % rows != 0)
    # direct simulation: lane c covers stream positions [c*rows,(c+1)*rows)
    for b in range(nb):
        if not counts[b]:
            continue
        last = ends[b] - 1
        mid_lane = (last % rows) != rows - 1
        assert use[b] == mid_lane
        if use[b]:
            # the gathered accumulator at (row last%rows, lane last//rows)
            # covers exactly bucket b's positions within that lane
            lane = last // rows
            lane_lo = lane * rows
            seg = [s for s in range(lane_lo, last + 1) if k[s] == b]
            assert seg, (b, last)
            assert k[last] == b


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="interpret-mode bucket-scan kernel is slow; set RUN_SLOW_TESTS=1",
)
def test_scan_kernel_interpret_matches_oracle(small_cols, monkeypatch):
    """The packed-affine bucket-scan kernel (mixed adds, infinity key
    redirect) in interpret mode on the toy curve — the off-TPU correctness
    net for the production kernel path."""
    monkeypatch.setenv("DAVINCI_MSM_KERNEL", "interpret")
    monkeypatch.setattr(pp, "COLS", 32)
    from davinci_tpu.circuits.toycurve import toy_bls12

    spec = toy_bls12()["g1"]
    r = random.Random(5)
    n = 64
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    pts[5] = spec.infinity()  # infinity -> sink-key redirect path
    scalars = [r.randrange(spec.r) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = spec.r - 1
    for i in range(8, 24):
        scalars[i] = scalars[8]
    _run_case(spec, scalars, pts)


@pytest.mark.skipif(
    not os.environ.get("RUN_TPU_TESTS"),
    reason="monolithic bucket-scan kernel needs the real TPU (interpret "
    "mode is impractically slow); bench.py asserts the same oracle "
    "on every bench run",
)
def test_scan_kernel_msm_matches_oracle_tpu():
    """The production TPU MSM path (Pallas bucket-scan kernel + gather
    buckets) end-to-end vs the host oracle."""
    spec = C.bn254_g1
    r = random.Random(40)
    n = 8192
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(spec.r) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = spec.r - 1
    for i in range(8, 200):
        scalars[i] = scalars[8]
    _run_case(spec, scalars, pts)


def _sharded_case(n_windows: int):
    spec = C.bn254_g1
    dc = get_device_curve(spec)
    devs = jax.devices()
    assert len(devs) == 8
    mesh = jax.sharding.Mesh(np.array(devs), ("shard",))

    r = random.Random(91)
    n = 64 * 8
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
    scalars = [r.randrange(1 << (12 * n_windows)) for _ in range(n)]
    scalars[0] = 0

    P = dc.encode_points(pts)
    S = jnp.asarray(scalars_to_limbs(spec, scalars)[:, :n_windows].copy())
    out = sharded_msm(dc, P, S, mesh)
    got = dc.decode_points(tuple(a[None] for a in out))[0]
    assert got == _host_msm(spec, pts, scalars)


def test_pipeline_sharded_msm_matches(small_cols):
    """The all_gather bucket-merge branch of sharded_msm (the ICI design)
    on the 8-device virtual mesh — 8 of 22 windows (per-window graphs are
    shape-identical; minutes of XLA:CPU execution per window make the
    full width a heavy-tier case, and under parallel test load it trips
    XLA's collective-rendezvous watchdog)."""
    _sharded_case(8)


@pytest.mark.heavy
def test_pipeline_sharded_msm_matches_full_width(small_cols):
    """All 22 windows through the sharded bucket pipeline + full-width
    reduce on the virtual mesh (round-4 VERDICT ask) — heavy tier:
    ~10 min of pure XLA:CPU execution."""
    _sharded_case(22)


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="XLA:CPU compile on the per-limb kernel graphs is minutes even "
    "at toy sizes; the TPU oracle test + bench assert cover this path",
)
def test_horner_kernel_interpret_matches():
    """The monolithic Horner kernel (interpret mode, toy curve) against
    the XLA fori composition — quick off-TPU coverage for the kernel the
    TPU path launches (the full interpret scan test is RUN_SLOW_TESTS)."""
    from davinci_tpu.circuits.toycurve import toy_bls12
    from davinci_tpu.msm.bucket_kernel import horner_kernel

    spec = toy_bls12()["g1"]
    dc = get_device_curve(spec)
    r = random.Random(17)
    W = -(-spec.r.bit_length() // pp.WINDOW_BITS)
    B = 2
    pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(W * B)]
    sums3 = dc.encode_points(pts)  # (W*B, L) x3, window-major (w*B + b)
    sums_t = tuple(jnp.asarray(np.asarray(a)).T for a in sums3)  # (L, W*B)
    got = horner_kernel(dc, sums_t, W, interpret=True)
    got_pts = dc.decode_points(tuple(jnp.asarray(a).T for a in got))
    for b in range(B):
        want = spec.infinity()
        for w in reversed(range(W)):
            for _ in range(pp.WINDOW_BITS):
                want = want.add(want)
            want = want.add(pts[w * B + b])
        # Horner MSB-first: total = sum_w 2^(12w) S_w
        want2 = spec.infinity()
        for w in range(W):
            want2 = want2.add(pts[w * B + b].mul(1 << (pp.WINDOW_BITS * w)))
        assert want == want2  # sanity on the oracle itself
        assert got_pts[b] == want2


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="XLA:CPU compile on the per-limb kernel graphs is minutes even "
    "at toy sizes; the TPU oracle test + bench assert cover this path",
)
def test_suffix_reduce_kernel_interpret_matches():
    """suffix_reduce_kernel: A = sum S_k, B = sum k*S_k (interpret mode,
    toy curve) against host point arithmetic."""
    from davinci_tpu.circuits.toycurve import toy_bls12
    from davinci_tpu.msm.bucket_kernel import suffix_reduce_kernel

    spec = toy_bls12()["g1"]
    dc = get_device_curve(spec)
    r = random.Random(23)
    K, M = 5, 128
    pts = [
        [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(M)]
        for _ in range(K)
    ]
    rows = []
    for k in range(K):
        x, y, z = dc.encode_points(pts[k])  # (M, L) x3
        rows.append(jnp.concatenate([x.T, y.T, z.T], axis=0))  # (3L, M)
    s = jnp.stack(rows)  # (K, 3L, M)
    A2, B2 = suffix_reduce_kernel(dc, s, interpret=True)
    L = dc.df.L
    A = dc.decode_points(tuple(A2[c * L : (c + 1) * L].T for c in range(3)))
    Bv = dc.decode_points(tuple(B2[c * L : (c + 1) * L].T for c in range(3)))
    for m in range(0, M, 37):
        wa, wb = spec.infinity(), spec.infinity()
        for k in range(K):
            wa = wa.add(pts[k][m])
            wb = wb.add(pts[k][m].mul(k))
        assert A[m] == wa
        assert Bv[m] == wb
