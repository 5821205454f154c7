"""Emulated BW6-761 pairing gadget (circuit 4's aggregator verification):
oracle tests with truncated Miller loops — identical step/line/accumulate
code to the full loop, checked against a host-side truncation of
BW6PairingCtx.miller.  The full-length loop is a parameter (production /
gated; see the module docstring for the cost discussion)."""

import random

import pytest

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.circuits.pairing_gadget6 import PairingGadget6
from davinci_tpu.groth16 import ConstraintSystem
from davinci_tpu.pairing import bw6_pairing


def _host_truncated_miller(P, Q, loop: int):
    """BW6PairingCtx.miller with an arbitrary positive loop constant."""
    ctx = bw6_pairing
    p = ctx.p
    xq, yq = ctx._untwist(Q)
    one6 = ctx.fp6.one_ff()
    xt, yt = P.x.v, P.y.v
    xp, yp = P.x.v, P.y.v
    f = one6

    def line_eval(lam, xt, yt):
        return (xq - ctx.fp6.from_int(xt)) * lam - (yq - ctx.fp6.from_int(yt))

    for b in bin(loop)[3:]:
        lam = 3 * xt * xt % p * pow(2 * yt % p, -1, p) % p
        f = f * f * line_eval(lam, xt, yt)
        x3 = (lam * lam - 2 * xt) % p
        y3 = (lam * (xt - x3) - yt) % p
        xt, yt = x3, y3
        if b == "1":
            lam = (yp - yt) % p * pow((xp - xt) % p, -1, p) % p
            f = f * line_eval(lam, xt, yt)
            x3 = (lam * lam - xt - xp) % p
            y3 = (lam * (xt - x3) - yt) % p
            xt, yt = x3, y3
    return f


LOOP_BITS = 8


@pytest.mark.parametrize("kind", ["const", "var"])
def test_truncated_miller_matches_host(kind):
    rng = random.Random(0xB6)
    P = C.bw6_g1.gen.mul(rng.randrange(2, 1 << 64))
    Q = C.bw6_g2.gen.mul(rng.randrange(2, 1 << 64))
    loop = bw6_pairing.r >> (bw6_pairing.r.bit_length() - LOOP_BITS)

    cs = ConstraintSystem(F.BN254_R)
    pg = PairingGadget6(cs, loop_bits=LOOP_BITS)
    Pg = pg.g1.alloc_point(P)
    qdesc = ("const", Q) if kind == "const" else ("var", pg.g2.alloc_point(Q))
    f = pg.miller_pairs([(Pg, qdesc)])
    want = _host_truncated_miller(P, Q, loop)
    assert pg.fp6_value(f) == want
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_truncated_miller_two_pairs():
    rng = random.Random(0xB7)
    P1 = C.bw6_g1.gen.mul(rng.randrange(2, 1 << 64))
    P2 = C.bw6_g1.gen.mul(rng.randrange(2, 1 << 64))
    Q = C.bw6_g2.gen
    loop = bw6_pairing.r >> (bw6_pairing.r.bit_length() - LOOP_BITS)

    cs = ConstraintSystem(F.BN254_R)
    pg = PairingGadget6(cs, loop_bits=LOOP_BITS)
    f = pg.miller_pairs(
        [
            (pg.g1.alloc_point(P1), ("const", Q)),
            (pg.g1.alloc_point(P2), ("const", Q.mul(3))),
        ]
    )
    want = _host_truncated_miller(P1, Q, loop) * _host_truncated_miller(
        P2, Q.mul(3), loop
    )
    assert pg.fp6_value(f) == want
    assert cs.check_satisfied(), cs.first_unsatisfied()


def test_fp6_tower_ops_match_host():
    """The emulated Fp6 tower against the host BW6 tower oracle."""
    rng = random.Random(0xB8)
    cs = ConstraintSystem(F.BN254_R)
    pg = PairingGadget6(cs, loop_bits=LOOP_BITS)
    a_h = bw6_pairing.fp6.rand(rng)
    b_h = bw6_pairing.fp6.rand(rng)
    a = pg.fp6.alloc(a_h.v)
    b = pg.fp6.alloc(b_h.v)
    assert pg.fp6.value(pg.fp6.mul(a, b)) == (a_h * b_h).v
    assert pg.fp6.value(pg.fp6.square(a)) == (a_h * a_h).v
    assert pg.fp6.value(pg.fp6.inv(a)) == a_h.inv().v
    assert cs.check_satisfied(), cs.first_unsatisfied()
