"""Groth16 setup / prove / verify.

TPU-first split: *proving* (the hot path) runs on device — witness-vector
MSMs over the proving key, and the quotient polynomial via coset NTTs (the
coset vanishing polynomial is constant on the coset, so the division is one
scalar multiply).  *Setup* and *verification* are host paths (arbitrary-
precision + pairings).

Role parity: gnark's groth16 backend behind the reference's
prover/prover_cpu.go:20-64 and circuits/artifacts.go:474-571 (Setup /
ProveAndVerify), INCLUDING a Pedersen-commitment extension (gnark's
Groth16-with-commitments role): committed wires live on the gamma basis,
exposed through a commitment D in the proof with a KEA-style proof of
knowledge, and a Fiat-Shamir challenge wire bound to H(D) — the enabler
for log-derivative lookup range checks (circuits/lookup.py).
"""

from __future__ import annotations

import functools
import os
import random as _random
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from davinci_tpu import fields as F
from davinci_tpu import curves as C
from davinci_tpu import log
from davinci_tpu.curves import AffinePoint
from davinci_tpu.ec import get_device_curve
from davinci_tpu.groth16.bases import EncodedBases
from davinci_tpu.msm import msm
from davinci_tpu.msm.pippenger import (
    pack_scalars,
    scalars_to_limbs,
    unpack_limbs,
)
from davinci_tpu.ntt import get_device_ntt
from davinci_tpu.pairing import PAIRINGS


@dataclass(eq=False)
class ProvingKey:
    """MSM base sets live as EncodedBases (device-encoded limb arrays) —
    host AffinePoint lists re-encoded per prove were the round-1 scaling
    wall at multi-million-variable circuits.  Zero polynomials are PRUNED:
    a/b bases cover only wires with u_i != 0 / v_i != 0 (their witness
    scalars are gathered via a_indices/b_indices at prove time), matching
    gnark's infinity-point pruning."""

    alpha_g1: AffinePoint
    beta_g1: AffinePoint
    beta_g2: AffinePoint
    delta_g1: AffinePoint
    delta_g2: AffinePoint
    a_g1: EncodedBases       # [u_i(tau)] G1, i in a_indices
    b_g1: EncodedBases       # [v_i(tau)] G1, i in b_indices
    b_g2: EncodedBases       # [v_i(tau)] G2, i in b_indices
    k_g1: EncodedBases       # [(beta u + alpha v + w)/delta] G1, k_priv_indices
    z_g1: EncodedBases       # [tau^j Z(tau)/delta] G1, j < N-1
    domain_log: int
    a_indices: object = None  # np.int64 witness indices for a_g1 (None = all)
    b_indices: object = None
    # commitment extension (gnark Groth16-with-commitments role): gamma
    # basis for the committed wires + its eta-scaled copy for the PoK
    k_commit_g1: EncodedBases = None
    k_commit_eta_g1: EncodedBases = None
    k_priv_indices: list = None  # witness indices matching k_g1


@dataclass(eq=False)
class VerifyingKey:
    alpha_g1: AffinePoint
    beta_g2: AffinePoint
    gamma_g2: AffinePoint
    delta_g2: AffinePoint
    k_pub_g1: list      # [(beta u + alpha v + w)/gamma] G1, ONE + publics
    # commitment extension
    k_challenge_g1: AffinePoint = None  # gamma-basis point of the FS wire
    eta_g2: AffinePoint = None          # [eta] G2 for the PoK check


@dataclass(eq=False)
class Proof:
    a: AffinePoint
    b: AffinePoint  # G2
    c: AffinePoint


@dataclass(eq=False)
class CommittedProof(Proof):
    d: AffinePoint = None    # Pedersen commitment to the committed wires
    pok: AffinePoint = None  # knowledge proof: pok == eta * d


@functools.partial(jax.jit, static_argnums=0)
def _fixed_base_table_scan(dc, bx, by, bz):
    """(W, ...) per-window bases -> (W, NBUCKETS, ...) window tables via a
    log-depth Hillis-Steele prefix scan (12 batched adds total, ALL
    windows at once).  One jitted graph — the previous per-window eager
    build dispatched dozens of separately-compiled ops, which on the axon
    backend stalls setup for tens of minutes per fresh process."""
    from davinci_tpu.msm.pippenger import NBUCKETS

    W = bx.shape[0]
    lane = jnp.broadcast_to(jnp.arange(NBUCKETS), (W, NBUCKETS))
    bw = tuple(
        jnp.broadcast_to(a[:, None], (W, NBUCKETS) + a.shape[1:])
        for a in (bx, by, bz)
    )
    ident = dc.identity((W, NBUCKETS))
    cur = dc.select(lane >= 1, bw, ident)
    stride = 1
    while stride < NBUCKETS:
        shifted = tuple(jnp.roll(a, stride, axis=1) for a in cur)
        shifted = dc.select(lane >= stride, shifted, ident)
        cur = dc.add(cur, shifted)
        stride <<= 1
    return cur


@functools.cache
def _fixed_base_table(dc, gspec):
    """Fixed-base window table T[w, d] = d * 2^(12w) * G for every base-2^12
    scalar window w and digit d, as (W, 4096, ...) coordinate arrays.
    Host does W tiny point muls for the row bases; the device builds all
    rows in one jitted scan.  Cached per DeviceCurve.
    Role: gnark-crypto's fixed-base precomputation used by Setup."""
    from davinci_tpu.msm.pippenger import WINDOW_BITS

    W = -(-gspec.r.bit_length() // WINDOW_BITS)
    bases = []
    base_pt = gspec.gen
    for _ in range(W):
        bases.append(base_pt)
        base_pt = base_pt.mul(1 << WINDOW_BITS)
    bx, by, bz = dc.encode_points(bases)
    return _fixed_base_table_scan(dc, bx, by, bz)


@functools.partial(jax.jit, static_argnums=0)
def _fixed_base_mul_affine(dc, tx, ty, tz, S):
    """One fused graph per chunk: window mul + batched affine
    normalization (one device dispatch per setup chunk)."""
    return dc.affine_encoding(_fixed_base_mul(dc, tx, ty, tz, S))


@functools.partial(jax.jit, static_argnums=0)
def _fixed_base_mul(dc, tx, ty, tz, S):
    """[s_i * G] from the window table: S (n, W) base-2^12 digits ->
    projective (n, ...) batch.  W gathers + a log-tree of adds."""
    n, W = S.shape
    NB = tx.shape[1]
    tail = tx.shape[2:]
    idx = (jnp.arange(W, dtype=jnp.int32)[:, None] * NB + S.T).reshape(-1)
    parts = tuple(
        t.reshape((W * NB,) + tail)[idx].reshape((W, n) + tail)
        for t in (tx, ty, tz)
    )
    # pad the window axis to a power of two with identities, then halve
    Wp = 1 << (W - 1).bit_length() if W > 1 else 1
    if Wp != W:
        ident = dc.identity((Wp - W, n))
        parts = tuple(
            jnp.concatenate([p, i], axis=0) for p, i in zip(parts, ident)
        )
    while Wp > 1:
        half = Wp // 2
        lo = tuple(p[:half] for p in parts)
        hi = tuple(p[half:] for p in parts)
        parts = dc.add(lo, hi)
        Wp = half
    return tuple(p[0] for p in parts)


class Groth16:
    """Groth16 over one pairing curve ('bn254', 'bls12_377', 'bls12_381',
    'bw6_761' — the latter backing the aggregator circuit's outer proofs,
    reference circuits/aggregator/compile.go:19)."""

    def __init__(self, curve_name: str, ctx=None, fr=None):
        """Either a registered curve name, or an explicit (ctx, fr) pair —
        the latter lets synthetic curve families (toy recursion chains in
        CI, circuits/toycurve.py) reuse the whole backend."""
        self.curve_name = curve_name
        self.ctx = ctx or PAIRINGS[curve_name]
        self.fr = fr or {
            "bn254": F.bn254_fr,
            "bls12_377": F.bls12_377_fr,
            "bls12_381": F.bls12_381_fr,
            "bw6_761": F.bw6_761_fr,
        }[curve_name]
        self.g1 = self.ctx.g1
        self.g2 = self.ctx.g2
        self.dc = get_device_curve(self.g1)
        self.dc2 = get_device_curve(self.g2)
        self.ntt = get_device_ntt(self.fr)
        self.r = self.fr.p
        # multi-chip proving: when a mesh is set, proving-key MSMs run as
        # sharded_msm (points/buckets across devices, all_gather merge)
        # and the quotient NTTs as the four-step collective transform
        self.mesh = None
        self.mesh_axis = "shard"

    def set_mesh(self, mesh, axis_name: str = "shard"):
        """Distribute proving over a jax.sharding.Mesh axis (SURVEY §2.4
        pod-collective role).  Proofs are bit-identical to single-device
        (tests/test_groth16_sharded.py)."""
        self.mesh = mesh
        self.mesh_axis = axis_name

    # ------------------------------------------------------------------ setup

    def setup(self, cs, rng=None):
        """Trusted setup for the given ConstraintSystem (structure only)."""
        rng = rng or _random.Random(0x5E7)
        r = self.r
        n_cons = len(cs.constraints)
        m = cs.num_variables
        logN = max(1, (n_cons - 1).bit_length()) if n_cons > 1 else 1
        N = 1 << logN

        tau = rng.randrange(1, r)
        alpha = rng.randrange(1, r)
        beta = rng.randrange(1, r)
        gamma = rng.randrange(1, r)
        delta = rng.randrange(1, r)

        # Lagrange values L_j(tau) = Z(tau) * w^j / (N * (tau - w^j));
        # inverses via one batched Montgomery trick (no per-j modexp)
        w = self.fr.root_of_unity(logN)
        z_tau = (pow(tau, N, r) - 1) % r
        ninv = pow(N, -1, r)
        wjs = [1] * N
        for j in range(1, N):
            wjs[j] = wjs[j - 1] * w % r
        dens = [(tau - wj) % r for wj in wjs]
        prefix = [1] * (N + 1)
        for j in range(N):
            prefix[j + 1] = prefix[j] * dens[j] % r
        inv_all = pow(prefix[N], -1, r)
        inv_dens = [0] * N
        for j in reversed(range(N)):
            inv_dens[j] = inv_all * prefix[j] % r
            inv_all = inv_all * dens[j] % r
        lag = [z_tau * wjs[j] % r * inv_dens[j] % r * ninv % r for j in range(N)]

        # u_i(tau), v_i(tau), w_i(tau): vectorized sparse accumulation over
        # the CSR export (numpy object arrays — the constraint-count hot
        # loop of setup; the reference role is gnark's setup evaluation)
        import numpy as np

        lag_arr = np.empty(N, object)
        lag_arr[:] = lag
        uvw = []
        for idx, coeff, offs in cs._flat_matrices():
            acc = np.zeros(m, object)
            if len(idx):
                rows = np.repeat(
                    np.arange(len(offs) - 1), np.diff(offs)
                )
                np.add.at(acc, idx, coeff * lag_arr[rows])
            uvw.append([int(x) % r for x in acc])
        u, v, wv = uvw

        ginv = pow(gamma, -1, r)
        dinv = pow(delta, -1, r)
        npub = 1 + cs.num_public
        k_pub = [
            (beta * u[i] + alpha * v[i] + wv[i]) % r * ginv % r
            for i in range(npub)
        ]
        committed = list(getattr(cs, "committed", []) or [])
        chal_idx = getattr(cs, "challenge_idx", None)
        gamma_side = set(committed) | ({chal_idx} if chal_idx is not None else set())
        k_priv_pairs = [
            (i, kv)
            for i in range(npub, m)
            if i not in gamma_side
            and (kv := (beta * u[i] + alpha * v[i] + wv[i]) % r * dinv % r)
        ]
        k_priv_indices = [i for i, _ in k_priv_pairs]
        k_priv = [kv for _, kv in k_priv_pairs]
        eta = rng.randrange(1, r)
        k_commit = [
            (beta * u[i] + alpha * v[i] + wv[i]) % r * ginv % r
            for i in committed
        ]
        k_chal = (
            (beta * u[chal_idx] + alpha * v[chal_idx] + wv[chal_idx])
            % r * ginv % r
            if chal_idx is not None
            else None
        )
        # [tau^j * Z(tau)/delta], j in 0..N-2
        zd = z_tau * dinv % r
        z_scalars = []
        t_acc = zd
        for j in range(N - 1):
            z_scalars.append(t_acc)
            t_acc = t_acc * tau % r

        # prune zero polynomials: wires absent from A (resp. B) contribute
        # nothing to the A/B MSMs — their bases would be the infinity point
        a_indices = [i for i in range(m) if u[i]]
        b_indices = [i for i in range(m) if v[i]]
        g1e = functools.partial(self._batch_mul_enc, self.dc, self.g1)
        g2e = functools.partial(self._batch_mul_enc, self.dc2, self.g2)
        v_nz = [v[i] for i in b_indices]
        pk = ProvingKey(
            alpha_g1=self.g1.gen.mul(alpha),
            beta_g1=self.g1.gen.mul(beta),
            beta_g2=self.g2.gen.mul(beta),
            delta_g1=self.g1.gen.mul(delta),
            delta_g2=self.g2.gen.mul(delta),
            a_g1=g1e([u[i] for i in a_indices]),
            b_g1=g1e(v_nz),
            b_g2=g2e(v_nz),
            k_g1=g1e(k_priv),
            z_g1=g1e(z_scalars),
            domain_log=logN,
            a_indices=np.asarray(a_indices, np.int64),
            b_indices=np.asarray(b_indices, np.int64),
            k_commit_g1=g1e(k_commit),
            k_commit_eta_g1=g1e([x * eta % r for x in k_commit]),
            k_priv_indices=k_priv_indices,
        )
        vk = VerifyingKey(
            alpha_g1=pk.alpha_g1,
            beta_g2=pk.beta_g2,
            gamma_g2=self.g2.gen.mul(gamma),
            delta_g2=pk.delta_g2,
            k_pub_g1=self._batch_mul_enc(self.dc, self.g1, k_pub)
            .to_host_points(self.dc),
            k_challenge_g1=(
                self.g1.gen.mul(k_chal) if k_chal is not None else None
            ),
            eta_g2=self.g2.gen.mul(eta),
        )
        return pk, vk

    # fixed chunks: ONE compile shape for every setup batch size, and a
    # bound on device working set — Fp2 (G2) at 64k+ points crashes the
    # TPU worker (device memory blowup), 16k is safe there
    _BATCH_MUL_CHUNK = 65536
    _BATCH_MUL_CHUNK_G2 = 16384

    def _batch_mul_enc(self, dc, gspec, scalars) -> EncodedBases:
        """[s * gen] for a scalar list as EncodedBases — fixed-base window
        table (per-window gathers + a log-tree of adds) with batched
        affine normalization; the points never round-trip through host
        bignums.  The previous per-chunk 253-step double-and-add made the
        batch muls the dominant cost of full-size trusted setups."""
        if not scalars:
            return EncodedBases.empty(dc)
        n = len(scalars)
        max_chunk = (
            self._BATCH_MUL_CHUNK_G2
            if dc.ops.coord_ndim == 2
            else self._BATCH_MUL_CHUNK
        )
        chunk = min(
            max_chunk,
            1 << (n - 1).bit_length() if n > 1 else 1,
        )
        # the window table pays off on TPU (table build = 12 batched kernel
        # adds in one graph); on the CPU test backend its one-time compile
        # (~2 min per curve) dwarfs any execution win, so tests keep the
        # compile-tiny double-and-add
        fixed_base = jax.default_backend() == "tpu"
        table = _fixed_base_table(dc, gspec) if fixed_base else None
        base = (
            None if fixed_base else dc.encode_points([gspec.gen] * chunk)
        )
        outs = []
        for ofs in range(0, n, chunk):
            part = list(scalars[ofs : ofs + chunk])
            part += [0] * (chunk - len(part))
            S = jnp.asarray(scalars_to_limbs(gspec, part))
            if fixed_base:
                res = _fixed_base_mul_affine(dc, *table, S)
            else:
                res = dc.affine_encoding(dc.scalar_mul(base, S))
            outs.append(tuple(np.asarray(a) for a in res))
        return EncodedBases(
            np.concatenate([o[0] for o in outs])[:n],
            np.concatenate([o[1] for o in outs])[:n],
            np.concatenate([o[2] for o in outs])[:n],
        )

    # ------------------------------------------------------------------ prove

    def prove(self, pk: ProvingKey, cs, r_rand=None, s_rand=None) -> Proof:
        """Prove a *solved* ConstraintSystem (witness inside)."""
        r = self.r
        rng = _random.Random()
        rr = rng.randrange(r) if r_rand is None else r_rand
        ss = rng.randrange(r) if s_rand is None else s_rand

        z = cs.witness()
        N = 1 << pk.domain_log

        # --- quotient polynomial h on device -----------------------------
        n_cons = len(cs.constraints)
        _dw = os.environ.get("DAVINCI_DEVICE_WITNESS", "1")
        use_dev_witness = _dw == "force" or (
            jax.default_backend() == "tpu" and _dw != "0"
        )
        Zp = None
        dev_abc = None
        if use_dev_witness:
            try:
                from davinci_tpu.groth16.witness_dev import (
                    DeviceCSR,
                    matvec_device,
                    satisfied_device,
                )

                df = self.ntt.df
                with log.info_time(
                    "groth16.witness_reduce_dev", n_constraints=n_cons
                ):
                    dcsr = getattr(cs, "_dev_csr", None)
                    if dcsr is None:
                        dcsr = DeviceCSR(cs._flat_matrices(), r, df.L)
                        cs._dev_csr = dcsr
                    W = -(-self.g1.r.bit_length() // 12)
                    Zp = jnp.asarray(pack_scalars(self.g1, z))
                    Z_limbs = unpack_limbs(Zp, W)
                    dev_abc = matvec_device(df, dcsr, Z_limbs, N)
                    assert bool(
                        satisfied_device(df, *dev_abc, n_cons)
                    ), "witness does not satisfy constraints"
            except AssertionError:
                raise
            except Exception as e:  # compile/backend failure: host fallback
                log.warnw("witness_dev.fallback", error=str(e)[:200])
                use_dev_witness = False
                dev_abc = None
        if not use_dev_witness:
            with log.info_time(
                "groth16.witness_reduce", n_constraints=n_cons
            ):
                az, bz, czv = cs.matvec_all(z, N)
                # satisfaction check rides on the same reduction (a second
                # full matvec via check_satisfied doubled the host cost)
                a = np.empty(n_cons, object)
                a[:] = az[:n_cons]
                b = np.empty(n_cons, object)
                b[:] = bz[:n_cons]
                c = np.empty(n_cons, object)
                c[:] = czv[:n_cons]
                assert bool(
                    (((a * b - c) % r) == 0).all()
                ), "witness does not satisfy constraints"

        with log.info_time("groth16.quotient_ntt", domain=N):
            df = self.ntt.df
            g = self.fr.multiplicative_generator
            D = (
                self.mesh.shape[self.mesh_axis]
                if self.mesh is not None
                else 1
            )
            # the four-step decomposition needs N divisible by D^2
            if self.mesh is not None and N % (D * D) == 0:
                fwd = lambda x: self.ntt.sharded_ntt(x, self.mesh,
                                                     self.mesh_axis)
                inv = lambda x: self.ntt.sharded_intt(x, self.mesh,
                                                      self.mesh_axis)
                gp = self.ntt.power_table(g, N)
                gpi = self.ntt.power_table(pow(g, -1, r), N)
                coset_fwd = lambda c: fwd(df.mul(c, gp))
                coset_inv = lambda e: df.mul(inv(e), gpi)
            else:
                fwd, inv = self.ntt.ntt, self.ntt.intt
                coset_fwd = self.ntt.coset_ntt
                coset_inv = self.ntt.coset_intt
            # per-polynomial transforms: peak device memory is ~2 (N, L)
            # arrays instead of ~2 (3, N, L) — the difference between
            # fitting and OOMing the 2^24 full-size c2 domain in 16 GB HBM
            if dev_abc is not None:
                # device witness reduction: residues are already (N, L)
                # Montgomery on device — no host encode/upload
                cosets = [coset_fwd(inv(v)) for v in dev_abc]
                dev_abc = None
            else:
                cosets = [
                    coset_fwd(inv(df.encode(v))) for v in (az, bz, czv)
                ]
            num = df.sub(df.mul(cosets[0], cosets[1]), cosets[2])
            del cosets  # (N, L) x3 — HBM headroom for the h transform
            zc_inv = pow((pow(g, N, r) - 1) % r, -1, r)
            he = df.mul(num, df.encode_scalar(zc_inv))
            del num
            h_coeffs = coset_inv(he)
            del he
            # raw base-2^12 limbs ARE the MSM scalar format (WINDOW_BITS ==
            # LIMB_BITS): h feeds the z_g1 MSM without a host round-trip
            h_raw = df.from_mont(h_coeffs)
            del h_coeffs
            assert not bool(jnp.any(h_raw[N - 1] != 0)), (
                "quotient degree overflow"
            )

        # --- MSMs ---------------------------------------------------------
        # device-memory discipline at full-size domains (2^23 x L=22 on a
        # 16 GB chip): the h MSM runs FIRST (h_raw is already device-
        # resident and is the largest scalar set), then each per-set
        # unpack is dropped as soon as its MSM consumed it
        with log.info_time("groth16.msms", n_vars=len(z)):
            npub = 1 + cs.num_public
            h_lin = self._msm_enc(self.dc, self.g1, pk.z_g1, h_raw[: N - 1])
            del h_raw
            if jax.default_backend() == "tpu":
                # upload the witness ONCE as packed uint32 words (32 B per
                # scalar vs 88 B expanded); per-MSM scalar sets are device
                # gathers + a device unpack — the 3x expanded-limb uploads
                # over the axon tunnel were a measured per-prove cost
                W = -(-self.g1.r.bit_length() // 12)
                if Zp is None:  # device witness path already uploaded it
                    Zp = jnp.asarray(pack_scalars(self.g1, z))
                ai, bi, ki = self._pk_dev_indices(pk, npub, len(z))
                a_S = unpack_limbs(
                    Zp if ai is None else jnp.take(Zp, ai, axis=0), W
                )
                a_lin = self._msm_enc(self.dc, self.g1, pk.a_g1, a_S)
                del a_S
                k_S = unpack_limbs(jnp.take(Zp, ki, axis=0), W)
                k_lin = self._msm_enc(self.dc, self.g1, pk.k_g1, k_S)
                del k_S
                b_S = unpack_limbs(
                    Zp if bi is None else jnp.take(Zp, bi, axis=0), W
                )
                del Zp
            else:
                # CPU tests: one bytes-vectorized host pass + numpy gathers
                Z = scalars_to_limbs(self.g1, z)
                a_S = Z[pk.a_indices] if pk.a_indices is not None else Z
                a_lin = self._msm_enc(self.dc, self.g1, pk.a_g1, a_S)
                if pk.k_priv_indices is not None:
                    k_S = Z[np.asarray(pk.k_priv_indices, np.int64)]
                else:
                    k_S = Z[npub:]
                k_lin = self._msm_enc(self.dc, self.g1, pk.k_g1, k_S)
                b_S = Z[pk.b_indices] if pk.b_indices is not None else Z
            b1_lin = self._msm_enc(self.dc, self.g1, pk.b_g1, b_S)
            b2_lin = self._msm_enc(self.dc2, self.g2, pk.b_g2, b_S)
            del b_S

        # --- assembly (host, tiny) ---------------------------------------
        A = pk.alpha_g1.add(a_lin).add(pk.delta_g1.mul(rr))
        B1 = pk.beta_g1.add(b1_lin).add(pk.delta_g1.mul(ss))
        B2 = pk.beta_g2.add(b2_lin).add(pk.delta_g2.mul(ss))
        Cpt = (
            k_lin.add(h_lin)
            .add(A.mul(ss))
            .add(B1.mul(rr))
            .add(pk.delta_g1.mul((-rr * ss) % r))
        )
        return Proof(a=A, b=B2, c=Cpt)

    def prove_committed(self, pk: ProvingKey, build_fn, rng=None,
                        r_rand=None, s_rand=None) -> "CommittedProof":
        """Prove a circuit that uses cs.commit().

        build_fn(challenge, blind) -> solved ConstraintSystem.  Two-phase:
        (1) build with a fresh blinding value and challenge 0 to learn the
        committed wire values; compute D and pok over the commitment
        basis; (2) rebuild with challenge = H(D) and prove.  Both builds
        share the proving key because circuit structure is witness-
        independent (tests/test_emulated.py)."""
        rng = rng or _random.Random()
        blind = rng.randrange(self.r)
        cs0 = build_fn(0, blind)
        committed_vals = [cs0.values[i] for i in cs0.committed]
        D = self._msm_enc(self.dc, self.g1, pk.k_commit_g1, committed_vals)
        pok = self._msm_enc(
            self.dc, self.g1, pk.k_commit_eta_g1, committed_vals
        )
        challenge = self.commitment_challenge(D)
        refinalize = getattr(cs0, "_refinalize", None)
        if refinalize is not None:
            # incremental phase 2: only the challenge-dependent wires
            # (lookup inverse hints) are re-solved in place — the second
            # full Python circuit build was ~half the host prove cost
            refinalize(challenge)
            cs = cs0
        else:
            cs = build_fn(challenge, blind)
        assert [cs.values[i] for i in cs.committed] == committed_vals, (
            "committed wires must not depend on the challenge"
        )
        base = self.prove(pk, cs, r_rand=r_rand, s_rand=s_rand)
        return CommittedProof(a=base.a, b=base.b, c=base.c, d=D, pok=pok)

    def prove_committed_reuse(self, pk: ProvingKey, cs, rng=None,
                              r_rand=None, s_rand=None) -> "CommittedProof":
        """Re-prove a previously built committed system with ZERO Python
        constraint construction (the record-once witness plan's steady
        state; gnark's compile-once/solve-many CCS role,
        circuits/artifacts.go:74).

        Fresh blinding wire (zero-knowledge of D) + in-place challenge
        re-solve via the circuit's _refinalize hook; structure and all
        challenge-independent wires are reused as-is."""
        refinalize = getattr(cs, "_refinalize", None)
        assert refinalize is not None, (
            "prove_committed_reuse needs a circuit with a _refinalize hook"
        )
        rng = rng or _random.Random()
        cs.values[cs.committed[-1]] = rng.randrange(self.r)  # blind wire
        committed_vals = [cs.values[i] for i in cs.committed]
        D = self._msm_enc(self.dc, self.g1, pk.k_commit_g1, committed_vals)
        pok = self._msm_enc(
            self.dc, self.g1, pk.k_commit_eta_g1, committed_vals
        )
        refinalize(self.commitment_challenge(D))
        base = self.prove(pk, cs, r_rand=r_rand, s_rand=s_rand)
        return CommittedProof(a=base.a, b=base.b, c=base.c, d=D, pok=pok)

    def commitment_challenge(self, D: AffinePoint) -> int:
        """H(D) mod r — the Fiat-Shamir challenge the verifier recomputes.

        Hash choice is curve-bound: BN254 proofs are verified by EVM
        contracts, so keccak (cheap on-chain); every other curve's proofs
        are verified IN-CIRCUIT one level up the recursion chain
        (aggregator verifying committed vote-verifier proofs — reference
        gnark std/recursion commitment hash role), where the next
        circuit's native field is this curve's base field — so Poseidon
        over fp makes the in-circuit recomputation a few hundred
        constraints instead of a keccak permutation (~150k)."""
        if self.curve_name == "bn254":
            from davinci_tpu.ethereum import keccak256

            nb = (self.g1.fld.p.bit_length() + 7) // 8
            if D.infinity:
                data = b"\x00" * (2 * nb)
            else:
                data = D.x.v.to_bytes(nb, "big") + D.y.v.to_bytes(nb, "big")
            return (
                int.from_bytes(keccak256(b"davinci-commit-v1" + data), "big")
                % self.r
            )
        from davinci_tpu.hash.poseidon import poseidon_hash

        x, y = (0, 0) if D.infinity else (D.x.v, D.y.v)
        return poseidon_hash([x, y], p=self.g1.fld.p) % self.r

    def verify_committed(
        self, vk: VerifyingKey, proof: "CommittedProof", public_inputs: list
    ) -> bool:
        """Verification with the commitment terms: the challenge public is
        recomputed from D; the PoK check pins D to the committed basis."""
        if vk.k_challenge_g1 is None or proof.d is None or proof.pok is None:
            return False
        # PoK: e(pok, G2) == e(D, [eta] G2)
        if not self.ctx.pairing_check(
            [(proof.pok, self.g2.gen), (proof.d.neg(), vk.eta_g2)]
        ):
            return False
        z_pub = [1] + [x % self.r for x in public_inputs]
        if len(z_pub) != len(vk.k_pub_g1):
            return False
        pi = self.g1.infinity()
        for pt, s in zip(vk.k_pub_g1, z_pub):
            if s:
                pi = pi.add(pt.mul(s))
        challenge = self.commitment_challenge(proof.d)
        pi = pi.add(vk.k_challenge_g1.mul(challenge)).add(proof.d)
        return self.ctx.pairing_check(
            [
                (proof.a.neg(), proof.b),
                (vk.alpha_g1, vk.beta_g2),
                (pi, vk.gamma_g2),
                (proof.c, vk.delta_g2),
            ]
        )

    def _pk_dev_indices(self, pk, npub: int, m: int):
        """Device index arrays for the a/b/k witness gathers, cached on
        the ProvingKey (uploaded once per process)."""
        cached = getattr(pk, "_dev_idx", None)
        if cached is not None:
            return cached
        ai = None if pk.a_indices is None else jnp.asarray(
            np.asarray(pk.a_indices, np.int32)
        )
        bi = None if pk.b_indices is None else jnp.asarray(
            np.asarray(pk.b_indices, np.int32)
        )
        if pk.k_priv_indices is not None:
            ki = jnp.asarray(np.asarray(pk.k_priv_indices, np.int32))
        else:
            ki = jnp.arange(npub, m, dtype=jnp.int32)
        pk._dev_idx = (ai, bi, ki)
        return pk._dev_idx

    # MSM segment size: proving-key MSMs always run at this fixed shape
    # (tail zero-padded), so (a) every MSM in every circuit shares ONE
    # compiled graph — per-shape XLA/AOT recompiles measured 10+ minutes
    # per new size on the axon backend — and (b) device memory stays
    # bounded for multi-million-point keys (segments are uploaded per
    # call; partials are folded with host point adds).
    MSM_SEGMENT = 1 << 18
    # G2 (Fp2) adds run ~20x the G1 pallas-kernel cost per point, so the
    # fixed G2 compile shape is smaller to bound pad waste
    MSM_SEGMENT_G2 = 1 << 16

    def _msm_enc(self, dc, gspec, bases: EncodedBases, scalars):
        """MSM over pre-encoded bases, segmented at MSM_SEGMENT.

        `scalars` is either a list of host ints or an (n, W) raw base-2^12
        limb array (numpy or device — e.g. the quotient straight off the
        NTT, never round-tripped through Python)."""
        n = len(bases)
        if getattr(scalars, "ndim", None) == 2:
            S_full = scalars
        else:
            S_full = scalars_to_limbs(gspec, scalars)
        assert n == S_full.shape[0]
        if n == 0 or not bool(S_full.any()):
            return gspec.infinity()
        seg = (
            self.MSM_SEGMENT_G2
            if dc.ops.coord_ndim == 2
            else self.MSM_SEGMENT
        )
        if self.mesh is not None:
            return self._msm_enc_sharded(dc, gspec, bases, S_full, seg)
        if n <= seg:
            if jax.default_backend() == "tpu":
                # ONE compile shape for every proving-key MSM on the TPU:
                # the axon backend's per-shape AOT compile costs ~10 min,
                # so padding small circuits to the segment shape (one
                # cached executable per curve/group) beats a "natural"
                # shape by orders of magnitude on first prove
                return self._msm_enc_padded(dc, gspec, bases, S_full, seg)
            # CPU tests: natural (pow2-padded) shape compiles fast
            out = msm(dc, bases.device(), jnp.asarray(S_full))
            return dc.decode_points(tuple(a[None] for a in out))[0]
        return self._msm_enc_segmented(dc, gspec, bases, S_full, seg)

    def _msm_enc_padded(self, dc, gspec, bases, S_full, seg):
        """One fixed-(seg)-shape MSM: bases/scalars zero-padded to seg."""
        arrs = bases.device_padded(seg)
        if S_full.shape[0] != seg:
            if isinstance(S_full, np.ndarray):
                S = np.pad(S_full, ((0, seg - S_full.shape[0]), (0, 0)))
            else:
                S = jnp.pad(S_full, ((0, seg - S_full.shape[0]), (0, 0)))
        else:
            S = S_full
        from davinci_tpu.msm.pippenger import _use_scan_kernel

        # fixed-base fast path: PK bases never change between proves, so
        # the scan kernel's 16-bit plane repack is computed once per PK
        precomp = (
            bases.device_packed(seg, dc) if _use_scan_kernel(dc) else None
        )
        out = msm(dc, arrs, jnp.asarray(S), precomp=precomp)
        return dc.decode_points(tuple(a[None] for a in out))[0]

    def _msm_enc_segmented(self, dc, gspec, bases, S_full, seg):
        n = len(bases)
        total = None
        shape_tail = bases.x.shape[1:]
        for ofs in range(0, n, seg):
            hi = min(ofs + seg, n)
            S = S_full[ofs:hi]
            if not bool(S.any()):
                continue
            pads = ((0, seg - (hi - ofs)),) + ((0, 0),) * len(shape_tail)
            arrs = tuple(
                jnp.asarray(np.pad(a[ofs:hi], pads))
                for a in (bases.x, bases.y, bases.z)
            )
            if S.shape[0] != seg:
                S = jnp.pad(jnp.asarray(S), ((0, seg - S.shape[0]), (0, 0)))
            out = tuple(a[None] for a in msm(dc, arrs, jnp.asarray(S)))
            # fold segment partials on DEVICE; decode once at the end
            total = out if total is None else dc.add(total, out)
        if total is None:
            return gspec.infinity()
        return dc.decode_points(total)[0]

    def _msm_enc_sharded(self, dc, gspec, bases, S_full, seg):
        """Mesh-sharded MSM (points/buckets across devices, all_gather
        bucket merge), segmented for memory; partials fold on device."""
        from davinci_tpu.msm import sharded_msm

        n = len(bases)
        total = None
        for ofs in range(0, n, seg):
            hi = min(ofs + seg, n)
            S = S_full[ofs:hi]
            if not bool(S.any()):
                continue
            arrs = tuple(
                jnp.asarray(a[ofs:hi]) for a in (bases.x, bases.y, bases.z)
            )
            out = sharded_msm(
                dc, arrs, jnp.asarray(S), self.mesh, self.mesh_axis
            )
            out = tuple(a[None] for a in out)
            total = out if total is None else dc.add(total, out)
        if total is None:
            return gspec.infinity()
        return dc.decode_points(total)[0]

    # ----------------------------------------------------------------- verify

    def verify(self, vk: VerifyingKey, proof: Proof, public_inputs: list) -> bool:
        """public_inputs: the circuit's public values (without the ONE)."""
        z_pub = [1] + [x % self.r for x in public_inputs]
        if len(z_pub) != len(vk.k_pub_g1):
            return False
        pi = self.g1.infinity()
        for pt, s in zip(vk.k_pub_g1, z_pub):
            if s:
                pi = pi.add(pt.mul(s))
        return self.ctx.pairing_check(
            [
                (proof.a.neg(), proof.b),
                (vk.alpha_g1, vk.beta_g2),
                (pi, vk.gamma_g2),
                (proof.c, vk.delta_g2),
            ]
        )
