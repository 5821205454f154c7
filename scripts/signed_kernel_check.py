#!/usr/bin/env python3
"""Signed-digit bucket-scan kernel check (interpret mode, toy curve, no
XLA jits): reconstruct the window sums from the kernel's raw outputs
(bucket arrays + lane-final leftovers) with HOST point arithmetic and
compare the Horner total against sum_i s_i * P_i."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from davinci_tpu.circuits.toycurve import toy_bls12
from davinci_tpu.ec import get_device_curve
from davinci_tpu.msm import pippenger as pp
from davinci_tpu.msm.bucket_kernel import bucket_accumulate_kernel
from davinci_tpu.msm.pippenger import (
    SIGNED_NBUCKETS,
    WINDOW_BITS,
    _signed_sort_keys,
    scalars_to_limbs,
)

t0 = time.time()
spec = toy_bls12()["g1"]
dc = get_device_curve(spec)
r = random.Random(5)
n, cols = 64, 32
pts = [spec.gen.mul(r.randrange(1, spec.r)) for _ in range(n)]
pts[5] = spec.infinity()  # infinity -> sink-key redirect path
scalars = [r.randrange(spec.r) for _ in range(n)]
scalars[0] = 0
scalars[1] = 1
scalars[2] = spec.r - 1
for i in range(8, 24):
    scalars[i] = scalars[8]

P = dc.encode_points(pts)
S = scalars_to_limbs(spec, scalars)
keys = np.asarray(_signed_sort_keys(jnp.asarray(S)))
W = S.shape[1]
print(f"[{time.time()-t0:6.1f}s] setup n={n} W={W}")

buckets, acc, acc_key = bucket_accumulate_kernel(
    dc, P[0], P[1], P[2], jnp.asarray(keys.T), cols, SIGNED_NBUCKETS,
    interpret=True, signed=True,
)
print(f"[{time.time()-t0:6.1f}s] kernel done")


def dec(tup, idx2):
    """Decode transposed (L, Wt, X) x3 arrays at [w, x] -> host point."""
    w, x = idx2
    arrs = tuple(jnp.asarray(a)[:, w, x][None] for a in tup)
    # decode_points expects (batch, L): transpose back
    return dc.decode_points(tuple(a for a in arrs))[0]


nbp = SIGNED_NBUCKETS + 2
acc_key = np.asarray(acc_key)
totals = []
for w in range(W):
    B = {}
    for slot in range(SIGNED_NBUCKETS):
        p = dec(buckets, (w, slot))
        if not p.infinity:
            B[slot] = p
    # leftover merge (host emulation of _merge_leftovers_t):
    # group equal-key lane finals, fold each group into its bucket slot
    lane = 0
    while lane < cols:
        k = int(acc_key[w, lane])
        group = spec.infinity()
        j = lane
        while j < cols and int(acc_key[w, j]) == k:
            group = group.add(dec(acc, (w, j)))
            j += 1
        if k < SIGNED_NBUCKETS:
            B[k] = B.get(k, spec.infinity()).add(group)
        lane = j
    tw = spec.infinity()
    for slot, p in B.items():
        tw = tw.add(p.mul(slot + 1))
    totals.append(tw)

total = spec.infinity()
for w in reversed(range(W)):
    for _ in range(WINDOW_BITS):
        total = total.add(total)
    total = total.add(totals[w])

want = spec.infinity()
for p, s in zip(pts, scalars):
    want = want.add(p.mul(s))
assert total == want, "signed kernel window sums MISMATCH"
print(f"[{time.time()-t0:6.1f}s] signed kernel sums MATCH host oracle")
