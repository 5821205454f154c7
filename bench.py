#!/usr/bin/env python3
"""Headline benchmark: BN254 G1 MSM points/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference (vocdoni/davinci-node) publishes no numbers
(BASELINE.md) and its Go toolchain is unavailable in this image, so the
baseline is the documented order-of-magnitude estimate for gnark-crypto's
multicore CPU Pippenger on a modern server: ~1e7 points/s (ZKProphet,
gnark-crypto benchmarks).  vs_baseline = measured / 1e7.
"""

import json
import sys
import time

import numpy as np

GNARK_CPU_MSM_EST = 1.0e7  # points/s, documented estimate (see module docstring)


def main():
    import jax
    import jax.numpy as jnp

    from davinci_tpu import curves as C
    from davinci_tpu.ec import get_device_curve
    from davinci_tpu.msm import msm
    from davinci_tpu.msm.pippenger import NBUCKETS, WINDOW_BITS

    # default n = 2^18: the largest size where all 22 windows fit one
    # sort tile (MAX_TILE_ELEMS); beyond that the per-tile sorted copies
    # dominate (measured: 2^20 runs ~18% slower per point)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    spec = C.bn254_g1
    dc = get_device_curve(spec)

    # synthetic but valid points: batched doubling chain of the generator on
    # device (encode_points of n host muls would dominate setup time)
    rng = np.random.default_rng(42)
    base_pts = [spec.gen.mul(int(k)) for k in rng.integers(1, 2**31, size=64)]
    P64 = dc.encode_points(base_pts)
    reps = n // 64
    xs = jnp.tile(P64[0], (reps, 1))
    ys = jnp.tile(P64[1], (reps, 1))
    zs = jnp.tile(P64[2], (reps, 1))

    W = -(-spec.r.bit_length() // WINDOW_BITS)
    S = jnp.asarray(
        rng.integers(0, NBUCKETS, size=(n, W), dtype=np.int32)
    )

    # warmup/compile + CORRECTNESS: the tiled layout admits a cheap host
    # oracle (64 distinct points; per-point scalar sums), so the number
    # reported below is that of a verified kernel
    out = msm(dc, (xs, ys, zs), S)
    jax.block_until_ready(out)
    got = dc.decode_points(tuple(a[None] for a in out))[0]
    Snp = np.asarray(S, dtype=np.int64)
    want = spec.infinity()
    for b in range(64):
        per_window = Snp[b::64, :].sum(axis=0)  # fits int64 comfortably
        total = sum(int(v) << (WINDOW_BITS * j) for j, v in enumerate(per_window))
        want = want.add(base_pts[b].mul(total % spec.r))
    assert got == want, "MSM result does not match host oracle"

    t0 = time.time()
    iters = 3
    for _ in range(iters):
        out = msm(dc, (xs, ys, zs), S)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    pts_per_s = n / dt
    print(
        json.dumps(
            {
                "metric": "bn254_msm_points_per_s",
                "value": round(pts_per_s, 1),
                "unit": "points/s/chip",
                "vs_baseline": round(pts_per_s / GNARK_CPU_MSM_EST, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
