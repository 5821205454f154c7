"""Synthetic small pairing curves for CI-scale recursion tests.

The real recursion chain runs over BN254 / BLS12-377 / BW6-761; a full
emulated in-circuit pairing over those is tens of millions of constraints
— gated, not CI material.  This module derives a REAL BLS12-family curve
with a tiny parameter x (p ~ 64 bits, Miller loop ~ a dozen iterations),
so the exact same gadget code (EmulatedOps + PairingGadget12 +
Groth16VerifierGadget) runs end-to-end — real inner Groth16 proof,
emulated in-circuit verification, outer Groth16 proof — in seconds.

This mirrors the reference's use of small/dummy fixtures for circuit CI
(circuits/test/* inputs generators, voteverifier/dummy.go) while keeping
every code path identical to production.

Family (standard BLS12):
    r = x^4 - x^2 + 1,  p = (x-1)^2/3 * r + x,  t = x + 1,  loop = x.
Search criteria: x = 0 mod 128 (NTT 2-adicity >= 14), x = 1 mod 3,
p = 1 mod 6, p and r prime, r || p^12 - 1 (residue-witness final exp).
"""

from __future__ import annotations

import functools

from davinci_tpu import fields as F
from davinci_tpu.curves import (
    AffinePoint,
    CurveSpec,
    _g2_curve,
    j0_candidate_orders,
    sqrt_ff,
)
from davinci_tpu.pairing import PairingCtx
from davinci_tpu.towers import FF, CubicExt, Fp, QuadExt


def _is_prime(n: int) -> bool:
    return F._is_prime(n)


def _find_x(start: int = 256) -> int:
    x = start
    while x % 384 != 256:  # x = 0 mod 128, x = 1 mod 3
        x += 1
    while True:
        r = x**4 - x**2 + 1
        p3 = (x - 1) ** 2 * r
        if p3 % 3 == 0:
            p = p3 // 3 + x
            if (
                p % 6 == 1
                and _is_prime(p)
                and _is_prime(r)
                and (p**12 - 1) % r == 0
                and ((p**12 - 1) // r) % r != 0
            ):
                return x
        x += 384


@functools.cache
def toy_bls12():
    """Build the toy curve family: returns a dict with field specs, curve
    specs, pairing ctx, and a Groth16 factory."""
    x = _find_x()
    r = x**4 - x**2 + 1
    p = (x - 1) ** 2 // 3 * r + x
    h1 = (x - 1) ** 2 // 3
    assert p + 1 - (x + 1) == h1 * r

    fp = Fp(p, "toy.fp")
    # Fp2 nonresidue: smallest non-square
    nr = next(
        c
        for c in [-1, -2, -3, -5, 2, 3, 5, 7, -7, 11]
        if pow(c % p, (p - 1) // 2, p) != 1
    )
    fp2 = QuadExt(fp, fp(nr), "toy.fp2")

    # xi in Fp2: non-square and non-cube (so v^3 - xi and w^2 - v give a
    # field tower), and the D-twist b/xi must hit a curve with r-order
    # points over Fp2.
    def _ok_xi(a, b):
        xi = FF(fp2, (a % p, b % p))
        e2 = p * p - 1
        if (xi ** (e2 // 2)) == fp2.one_ff():
            return None
        if e2 % 3 == 0 and (xi ** (e2 // 3)) == fp2.one_ff():
            return None
        return xi

    g1 = None
    for bb in range(1, 40):
        cand = CurveSpec("toy_g1", fp, None, fp(bb), r, h1)
        # order check by random sampling
        try:
            cand.validate(samples=1)
        except AssertionError:
            continue
        g1 = cand
        break
    assert g1 is not None, "toy G1 not found"

    xi = None
    g2 = None
    for a, b in [(0, 1), (1, 1), (2, 1), (1, 2), (3, 1), (1, 3), (5, 1)]:
        cand_xi = _ok_xi(a, b)
        if cand_xi is None:
            continue
        try:
            g2 = _g2_curve("toy_g2", fp2, None, cand_xi, g1.b_ff.v, p, r, True)
        except AssertionError:
            continue
        xi = cand_xi
        break
    assert g2 is not None, "toy G2 twist not found"

    fp6 = CubicExt(fp2, xi, "toy.fp6")
    fp12 = QuadExt(fp6, fp6.from_base(fp2.zero_ff()), "toy.fp12")
    fp12.nr = (fp2.zero_ff().v, fp2.one_ff().v, fp2.zero_ff().v)

    # device field specs (12-bit limb layout, generic)
    fr_spec = F.FieldSpec("toy_fr", r, -(-r.bit_length() // F.LIMB_BITS))
    fp_spec = F.FieldSpec("toy_fp", p, -(-p.bit_length() // F.LIMB_BITS))
    g1.field_spec = fp_spec
    g2.field_spec = fp_spec

    g1.gen = g1.find_generator()
    g2.gen = g2.find_generator()

    ctx = PairingCtx(
        "toy_bls12", g1, g2, fp12, p, r,
        loop_count=x, loop_neg=False, is_bn=False, twist_d_type=True,
    )
    # sanity: bilinearity on the toy curve
    e1 = ctx.pair(g1.gen.mul(5), g2.gen.mul(7))
    e2 = ctx.pair(g1.gen, g2.gen) ** 35
    assert e1 == e2 and e1 != fp12.one_ff(), "toy pairing broken"

    return {
        "x": x, "p": p, "r": r,
        "fp": fp, "fp2": fp2, "fp6": fp6, "fp12": fp12,
        "g1": g1, "g2": g2, "ctx": ctx,
        "fr_spec": fr_spec, "fp_spec": fp_spec,
    }


def toy_groth16():
    """A Groth16 backend over the toy curve (device MSM/NTT included)."""
    from davinci_tpu.groth16 import Groth16

    t = toy_bls12()
    return Groth16("toy_bls12", ctx=t["ctx"], fr=t["fr_spec"])
