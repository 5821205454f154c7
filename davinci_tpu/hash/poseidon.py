"""Poseidon hash (circomlib/iden3-compatible) — host oracle + batched device
permutation.

Role: the protocol's workhorse hash — state-tree nodes, vote IDs, ballot
hashes, blob binding (reference crypto/hash/poseidon/multiposeidon.go:19-40,
spec/voteid.go, and the iden3 go-iden3-crypto dependency).

Constants are *generated* with the Grain LFSR procedure of the Poseidon
reference implementation (the same one circomlib's constants came from), and
validated at import against the universally published iden3 test vectors —
so no opaque constant blobs live in this repo.

Device design: the permutation is a lax.scan over rounds; the MDS mix is one
batched limb-mul (batch, t, t, L) followed by an integer column-sum and a
bounded conditional-subtract reduction (sums of t terms stay far inside
int32 headroom) — cheap and uniform for the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu import fields as F
from davinci_tpu.ff import get_device_field
from davinci_tpu.ff.mod import carry_fix

R_F = 8
# circomlib partial-round counts for t = 2..17
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]


class _Grain:
    """Grain LFSR stream from the Poseidon reference implementation."""

    def __init__(self, p_bits: int, t: int, r_f: int, r_p: int):
        bits = []
        for val, width in ((1, 2), (0, 4), (p_bits, 12), (t, 12), (r_f, 10), (r_p, 10)):
            bits += [(val >> (width - 1 - i)) & 1 for i in range(width)]
        bits += [1] * 30
        assert len(bits) == 80
        self.state = bits
        for _ in range(160):
            self._next_raw()

    def _next_raw(self) -> int:
        s = self.state
        new = s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        self.state = s[1:] + [new]
        return new

    def next_bit(self) -> int:
        # shrinking: output the 2nd bit of pairs whose 1st bit is 1
        while True:
            b1 = self._next_raw()
            b2 = self._next_raw()
            if b1:
                return b2

    def next_field_element(self, p: int, n_bits: int, reject: bool = True) -> int:
        """Round constants use rejection sampling; the MDS x/y values are
        reduced mod p directly (that asymmetry is in the upstream generator
        and is load-bearing for matching circomlib's constants)."""
        while True:
            v = 0
            for _ in range(n_bits):
                v = (v << 1) | self.next_bit()
            if not reject:
                return v % p
            if v < p:
                return v


@functools.lru_cache(maxsize=None)
def poseidon_constants(t: int, p: int = F.BN254_R, n_bits: int | None = None):
    """(C, M): round constants (R*t) and MDS matrix (t x t) for state width t.

    n_bits: grain sample width.  Defaults to 254 (the circomlib/iden3
    convention, kept for every field >= 254 bits so existing instances are
    stable); fields smaller than 254 bits (toy recursion curves) sample at
    their own width — 254-bit rejection sampling against a small p would
    never terminate."""
    if n_bits is None:
        n_bits = min(254, p.bit_length())
    r_p = N_ROUNDS_P[t - 2]
    g = _Grain(n_bits, t, R_F, r_p)
    n_rounds = R_F + r_p
    C = [g.next_field_element(p, n_bits) for _ in range(n_rounds * t)]
    xs = [g.next_field_element(p, n_bits, reject=False) for _ in range(t)]
    ys = [g.next_field_element(p, n_bits, reject=False) for _ in range(t)]
    M = [[pow((xs[i] + ys[j]) % p, -1, p) for j in range(t)] for i in range(t)]
    return C, M


def _perm_host(state: list[int], t: int, p: int = F.BN254_R) -> list[int]:
    """Reference permutation (Hades: R_F/2 full, R_P partial, R_F/2 full)."""
    C, M = poseidon_constants(t, p)
    r_p = N_ROUNDS_P[t - 2]
    half = R_F // 2
    ctr = 0
    s = list(state)

    def ark():
        nonlocal ctr
        for i in range(t):
            s[i] = (s[i] + C[ctr]) % p
            ctr += 1

    def sbox_all():
        for i in range(t):
            s[i] = pow(s[i], 5, p)

    def mix():
        nonlocal s
        s = [sum(M[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    for _ in range(half):
        ark()
        sbox_all()
        mix()
    for _ in range(r_p):
        ark()
        s[0] = pow(s[0], 5, p)
        mix()
    for _ in range(half):
        ark()
        sbox_all()
        mix()
    return s


def poseidon_hash(inputs: list[int], p: int = F.BN254_R) -> int:
    """iden3/circomlib Poseidon: state = [0, in...], output = state[0]."""
    t = len(inputs) + 1
    assert 1 <= len(inputs) <= 16, "poseidon arity 1..16"
    state = [0] + [x % p for x in inputs]
    return _perm_host(state, t, p)[0]


def multi_poseidon(inputs: list[int], p: int = F.BN254_R) -> int:
    """Chunked Poseidon over unbounded input counts — chunk 16, recurse
    (reference crypto/hash/poseidon/multiposeidon.go:19-40)."""
    if not inputs:
        raise ValueError("no inputs provided")
    if len(inputs) <= 16:
        return poseidon_hash(inputs, p)
    hashes = [
        poseidon_hash(inputs[i : i + 16], p) for i in range(0, len(inputs), 16)
    ]
    if len(hashes) == 1:
        return hashes[0]
    if len(hashes) <= 16:
        return poseidon_hash(hashes, p)
    return multi_poseidon(hashes, p)


# ---------------------------------------------------------------------------
# Validation against published iden3 vectors (import-time self-check)
# ---------------------------------------------------------------------------

_V1 = 18586133768512220936620570745912940619677854269274689475585506675881198879027
_V2 = 7853200120776062878684798364095072458815029376092732009249414926327459813530
assert poseidon_hash([1]) == _V1, "Poseidon t=2 does not match iden3 vector"
assert poseidon_hash([1, 2]) == _V2, "Poseidon t=3 does not match iden3 vector"


# ---------------------------------------------------------------------------
# Device batched Poseidon
# ---------------------------------------------------------------------------


class DevicePoseidon:
    """Batched Poseidon permutation for a fixed arity t over BN254 Fr.

    hash(x): x is (batch, t-1, L) Montgomery limbs -> (batch, L).
    """

    def __init__(self, t: int, spec=F.bn254_fr):
        self.t = t
        self.spec = spec
        self.df = get_device_field(spec)
        C, M = poseidon_constants(t, spec.p)
        r_p = N_ROUNDS_P[t - 2]
        self.n_rounds = R_F + r_p
        mont = lambda v: v * spec.r % spec.p
        self.C = jnp.asarray(
            spec.batch_to_limbs([mont(c) for c in C])
        ).reshape(self.n_rounds, t, self.df.L)
        self.M = jnp.asarray(
            spec.batch_to_limbs([mont(M[i][j]) for i in range(t) for j in range(t)])
        ).reshape(t, t, self.df.L)
        # full-round flags
        half = R_F // 2
        flags = [1] * half + [0] * r_p + [1] * half
        self.full_flags = jnp.asarray(flags, jnp.int32)
        # p << j multiples (L+1 limbs) for the bounded sum reduction
        ext = np.zeros((6, self.df.L + 1), np.int32)
        for j in range(6):
            v = spec.p << j
            for i in range(self.df.L + 1):
                ext[j, i] = v & 0xFFF
                v >>= 12
        self._p_mults = jnp.asarray(ext)
        self.permute = jax.jit(self.permute)
        self.hash = jax.jit(self.hash)

    def _sum_mod(self, terms: jnp.ndarray) -> jnp.ndarray:
        """Sum over axis -2 of Montgomery limb values (k <= 17 terms),
        reduced mod p: integer column sum + carry + descending conditional
        subtracts of 2^j * p (branchless: borrow read off an extra limb)."""
        df = self.df
        k = terms.shape[-2]
        cols = jnp.sum(terms, axis=-2, dtype=jnp.int32)
        x = carry_fix(cols, df.L + 1)
        jtop = max(0, (k - 1).bit_length() - 1) + 1  # 2^jtop >= k
        for jj in range(jtop, -1, -1):
            ext = jnp.concatenate(
                [
                    x - self._p_mults[jj],
                    jnp.zeros(x.shape[:-1] + (1,), jnp.int32),
                ],
                axis=-1,
            )
            d = carry_fix(ext, df.L + 2)
            borrow = d[..., df.L + 1] != 0
            x = jnp.where(borrow[..., None], x, d[..., : df.L + 1])
        return x[..., : df.L]

    def permute(self, state: jnp.ndarray) -> jnp.ndarray:
        """state: (..., t, L) Montgomery -> permuted state."""
        df = self.df
        t = self.t

        def round_body(s, xs):
            c, full = xs
            s = df.add(s, c)
            # sbox
            s2 = df.square(s)
            s4 = df.square(s2)
            s5 = df.mul(s4, s)
            first5 = jnp.concatenate([s5[..., :1, :], s[..., 1:, :]], axis=-2)
            s = jnp.where((full == 1), s5, first5)
            # mix: out[i] = sum_j M[i][j] * s[j]
            prod = df.mul(self.M, s[..., None, :, :])  # (..., t, t, L)
            s = self._sum_mod(prod)
            return s, None

        state, _ = jax.lax.scan(
            round_body, state, (self.C, self.full_flags)
        )
        return state

    def hash(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (..., t-1, L) Montgomery -> (..., L)."""
        lead = inputs.shape[:-2]
        zero = jnp.zeros(lead + (1, self.df.L), jnp.int32)
        state = jnp.concatenate([zero, inputs], axis=-2)
        return self.permute(state)[..., 0, :]

    # host boundary helpers
    def hash_ints(self, rows: list[list[int]]) -> list[int]:
        arr = jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            self.spec.to_limbs(v * self.spec.r % self.spec.p)
                            for v in row
                        ]
                    )
                    for row in rows
                ]
            )
        )
        out = self.hash(arr)
        return self.df.decode(out)


@functools.cache
def get_device_poseidon(t: int, spec=F.bn254_fr) -> DevicePoseidon:
    return DevicePoseidon(t, spec)
