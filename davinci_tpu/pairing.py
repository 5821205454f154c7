"""Host-side pairings for BN254, BLS12-377, BLS12-381 (BW6-761 to follow).

Correctness-first design: G2 points are untwisted into E(Fp12) and the
Miller loop runs with generic affine line functions over Fp12; the final
exponentiation is a plain pow by (p^12-1)/r.  This is the *verification*
path (host, cold) — proving never touches pairings, so the clarity/speed
trade is deliberate.  Validated structurally by bilinearity +
non-degeneracy tests (tests/test_pairing.py).

Role parity: gnark-crypto's pairing packages used by groth16.Verify in the
reference (circuits/artifacts.go:543 ProveAndVerify; api ballot-proof
verification api/ballotproof_verifier.go).
"""

from __future__ import annotations

from dataclasses import dataclass

from davinci_tpu import curves as C
from davinci_tpu import fields as F
from davinci_tpu.curves import AffinePoint
from davinci_tpu.towers import FF


@dataclass(eq=False)
class PairingCtx:
    name: str
    g1: object          # CurveSpec (coords in Fp)
    g2: object          # CurveSpec (coords in Fp2)
    fp12: object        # QuadExt over Fp6
    p: int
    r: int
    loop_count: int     # ate loop (positive)
    loop_neg: bool      # x < 0 (conjugate at the end)
    is_bn: bool         # BN curves need the two Frobenius line steps
    twist_d_type: bool  # D-type: psi(x,y) = (x w^2, y w^3); M-type: w^-2, w^-3

    def __post_init__(self):
        fp6 = self.fp12.base
        fp2 = fp6.base
        self.fp2 = fp2
        self.fp6 = fp6
        one2 = fp2.one_ff()
        zero2 = fp2.zero_ff()
        # w = (0, 1) over Fp6, i.e. Fp12 element (0_fp6, 1_fp6)
        self.w = FF(self.fp12, (fp6.zero_ff().v, fp6.one_ff().v))
        self.final_exp = (self.p**12 - 1) // self.r
        assert (self.p**12 - 1) % self.r == 0

    # -- embeddings ----------------------------------------------------------

    def _fp_to_12(self, x: int) -> FF:
        fp2 = self.fp2
        e2 = FF(fp2, (x % self.p, 0))
        return self._fp2_to_12(e2)

    def _fp2_to_12(self, x: FF) -> FF:
        fp6 = self.fp6
        z2 = fp6.base.zero_ff().v
        e6 = FF(fp6, (x.v, z2, z2))
        return FF(self.fp12, (e6.v, fp6.zero_ff().v))

    def _untwist(self, q: AffinePoint):
        """G2 (coords in Fp2) -> point on E over Fp12."""
        x12 = self._fp2_to_12(q.x)
        y12 = self._fp2_to_12(q.y)
        w2 = self.w * self.w
        w3 = w2 * self.w
        if self.twist_d_type:
            return (x12 * w2, y12 * w3)
        return (x12 * w2.inv(), y12 * w3.inv())

    def _g1_to_12(self, pt: AffinePoint):
        return (self._fp_to_12(pt.x.v), self._fp_to_12(pt.y.v))

    # -- Miller machinery ----------------------------------------------------

    def _line(self, t, q, p):
        """Evaluate the line through t and q (affine pairs over Fp12) at p.
        Returns (value, t+q)."""
        xt, yt = t
        xq, yq = q
        xp, yp = p
        if xt == xq and yt == yq:
            lam = (3 * (xt * xt)) * (2 * yt).inv()
        elif xt == xq:
            # vertical line
            x3 = self._ec_add(t, q)  # infinity
            return (xp - xt), None
        else:
            lam = (yq - yt) * (xq - xt).inv()
        val = lam * (xp - xt) - (yp - yt)
        x3 = lam * lam - xt - xq
        y3 = lam * (xt - x3) - yt
        return val, (x3, y3)

    def _ec_add(self, a, b):
        return None  # only reached for vertical lines (not used for our loops)

    def miller(self, P: AffinePoint, Q: AffinePoint) -> FF:
        p12_one = self.fp12.one_ff()
        q12 = self._untwist(Q)
        p_pt = self._g1_to_12(P)
        t = q12
        f = p12_one
        bits = bin(self.loop_count)[3:]  # skip MSB
        for b in bits:
            val, t = self._line(t, t, p_pt)
            f = f * f * val
            if b == "1":
                val, t = self._line(t, q12, p_pt)
                f = f * val
        if self.is_bn:
            # two extra steps with pi(Q) and -pi^2(Q)
            q1 = self._frobenius_pt(q12, 1)
            q2 = self._frobenius_pt(q12, 2)
            nq2 = (q2[0], -q2[1])
            val, t = self._line(t, q1, p_pt)
            f = f * val
            val, t = self._line(t, nq2, p_pt)
            f = f * val
        if self.loop_neg:
            f = FF(self.fp12, self.fp12.conj(f.v))  # f^(p^6) == 1/f post-exp
        return f

    def _frobenius_pt(self, pt, k: int):
        x, y = pt
        e = self.p**k
        return (x**e, y**e)

    def pair(self, P: AffinePoint, Q: AffinePoint) -> FF:
        """Full pairing e(P, Q); P on G1, Q on G2.  Identity inputs -> 1."""
        if P.infinity or Q.infinity:
            return self.fp12.one_ff()
        f = self.miller(P, Q)
        return f**self.final_exp

    def pairing_check(self, pairs) -> bool:
        """prod e(P_i, Q_i) == 1 — the Groth16 verification form."""
        acc = self.fp12.one_ff()
        for P, Q in pairs:
            if P.infinity or Q.infinity:
                continue
            acc = acc * self.miller(P, Q)
        return acc**self.final_exp == self.fp12.one_ff()


bn254_pairing = PairingCtx(
    "bn254",
    C.bn254_g1,
    C.bn254_g2,
    C.fp12_bn254,
    F.BN254_P,
    F.BN254_R,
    loop_count=6 * F.BN254_X + 2,
    loop_neg=False,
    is_bn=True,
    twist_d_type=True,
)

bls377_pairing = PairingCtx(
    "bls12_377",
    C.bls377_g1,
    C.bls377_g2,
    C.fp12_bls377,
    F.BLS12_377_P,
    F.BLS12_377_R,
    loop_count=F.BLS12_377_X,
    loop_neg=False,
    is_bn=False,
    twist_d_type=True,
)

bls381_pairing = PairingCtx(
    "bls12_381",
    C.bls381_g1,
    C.bls381_g2,
    C.fp12_bls381,
    F.BLS12_381_P,
    F.BLS12_381_R,
    loop_count=-F.BLS12_381_X,
    loop_neg=True,
    is_bn=False,
    twist_d_type=False,
)

PAIRINGS = {
    "bn254": bn254_pairing,
    "bls12_377": bls377_pairing,
    "bls12_381": bls381_pairing,
}
