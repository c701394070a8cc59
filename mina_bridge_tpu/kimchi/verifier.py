"""The TPU Kimchi-style PLONK verifier: batched, jittable, one MSM.

Device counterpart of prover_host.py — the "train step" of this
framework. Verifies B structurally-identical proofs at once:

1. One scheduled Poseidon scan derives every Fiat-Shamir challenge
   (beta, gamma, alpha, zeta, v, u) for all B transcripts in parallel
   (hash/poseidon.run_transcript).
2. The gate + permutation + quotient identity is checked at zeta with
   lazy field arithmetic (fields/ffl.py).
3. All 35 polynomial openings at (zeta, zeta*omega) reduce to ONE
   random-linear-combination MSM over the SRS (commitment/ipa.py +
   ops/msm.py), shardable across chips.

Mirrors the verifier flow of the reference's pinned `kimchi` crate
(README.md:409-475 sequence diagram; SURVEY §2b) in TPU-native form.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..commitment import ipa
from ..curves import jaxcurve as jc
from ..curves.host import CurveSpec
from ..fields import ffl
from ..fields.params import NLIMBS, int_to_limbs
from ..hash import poseidon
from ..hash.poseidon_params import poseidon_spec
from . import gates as G
from .circuit import COEFFS, COLUMNS, PERMUTS, ZK_ROWS
from .prover_host import (
    ALPHA_LOOKUP,
    ALPHA_PERM,
    N_ALPHAS,
    N_LOOKUP_OPENED,
    N_OPENED,
    NSORTED,
    T_CHUNKS,
    HostProof,
    VerifierIndexHost,
)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "index_comms",
        "lagrange_comm",
        "g_affine",
        "h_affine",
        "digest_limbs",
        "omega_rep",
        "omega_last_rep",
        "omega_zk_rep",
        "n_inv_rep",
        "omega_pows_rep",
        "omega_chunk_rep",
        "lag_chunk_a_rep",
        "omega_iN_rep",
        "shifts_rep",
    ],
    meta_fields=["curve", "n", "log_n", "npub", "field_name", "nc"],
)
@dataclasses.dataclass
class DeviceVerifierIndex:
    """Verifier index as a jit PYTREE argument: every per-circuit constant
    is an array leaf, so all circuits with the same shape signature
    (n, npub, field, curve, nc) share ONE compiled verify executable.

    nc is the commitment chunk count (1 for domains within the SRS):
    every opened polynomial is committed/opened in nc SRS-sized chunks
    (prover_host chunk helpers; reference README.md:485-486 real
    domains Step 2^18 / Wrap 2^17 over the 2^16 SRS)."""

    curve: CurveSpec
    n: int
    log_n: int
    npub: int
    field_name: str
    nc: int
    # (37, nc, 2, NLIMBS): sigma[7] + coeffs[15] + sel[9] + table cols
    # [col0, col1, col2, ids, rt_sel] + q_lookup, per chunk
    index_comms: np.ndarray
    # (max(npub,1), nc, 2, NLIMBS): chunked Lagrange-basis commitments
    # L_i for the public-input rows (kimchi keeps these in the SRS)
    lagrange_comm: np.ndarray
    g_affine: np.ndarray  # (N, 2, NLIMBS): the SRS prefix (chunk size)
    h_affine: np.ndarray  # (2, NLIMBS)
    digest_limbs: np.ndarray  # (NLIMBS,)
    omega_rep: np.ndarray  # (REP_LIMBS,)
    omega_last_rep: np.ndarray  # (REP_LIMBS,) = omega^(n-1)
    omega_zk_rep: np.ndarray  # (ZK_ROWS, REP_LIMBS): omega^(n-1..n-ZK_ROWS)
    n_inv_rep: np.ndarray  # (REP_LIMBS,)
    omega_pows_rep: np.ndarray  # (npub, REP_LIMBS)
    omega_chunk_rep: np.ndarray  # (REP_LIMBS,): omega^N (primitive nc-th root)
    # closed-form public chunk-eval constants (prover_host.
    # lagrange_chunk_eval): A_ij = omega^(i(n - jN - N + 1)) and
    # omega^(iN), so (L_i)_j(y) = A_ij (y^N - omega^(iN)) / (n (y - w^i))
    lag_chunk_a_rep: np.ndarray  # (npub, nc, REP_LIMBS)
    omega_iN_rep: np.ndarray  # (npub, REP_LIMBS)
    shifts_rep: np.ndarray  # (PERMUTS, 1, REP_LIMBS)

    @property
    def chunk_size(self) -> int:
        return self.n // self.nc

    @classmethod
    def from_host(cls, index: VerifierIndexHost, g, h) -> "DeviceVerifierIndex":
        from .prover_host import as_chunks, commit_chunks

        def aff(pt):
            if pt is None:
                return np.zeros((2, NLIMBS), np.int32)
            return np.stack([int_to_limbs(pt[0], NLIMBS), int_to_limbs(pt[1], NLIMBS)])

        def rep(v):
            return int_to_limbs(v % index.curve.scalar.p, ffl.REP_LIMBS)

        nc = index.chunks
        N = index.chunk_size

        def affc(pc):  # (nc, 2, NLIMBS)
            return np.stack([aff(p) for p in as_chunks(pc)])

        comms = [affc(p) for p in index.sigma_comm]
        comms += [affc(p) for p in index.coeff_comm]
        comms += [affc(index.sel_comm[g_]) for g_ in G.GATE_ORDER]
        comms += [affc(p) for p in index.table_comm]  # 5 table-col comms
        comms += [affc(index.qlk_comm)]
        n = index.domain.n
        fs = index.curve.scalar
        omega = index.domain.omega
        # chunked Lagrange commitments for the public rows
        from .domain import ifft as _ifft

        g = g[:N]
        lag = []
        for i in range(max(index.npub, 1)):
            unit = [0] * n
            unit[i] = 1
            lag.append(
                affc(
                    commit_chunks(
                        index.curve, g, h, _ifft(index.domain, unit), 0, N, nc
                    )
                )
                if index.npub
                else np.zeros((nc, 2, NLIMBS), np.int32)
            )
        npub1 = max(index.npub, 1)
        lag_a = np.zeros((npub1, nc, ffl.REP_LIMBS), np.int32)
        om_iN = np.zeros((npub1, ffl.REP_LIMBS), np.int32)
        for i in range(npub1):
            om_iN[i] = rep(pow(omega, i * N, fs.p))
            for j in range(nc):
                lag_a[i, j] = rep(pow(omega, i * (n - j * N - N + 1), fs.p))
        return cls(
            curve=index.curve,
            n=n,
            log_n=index.domain.log_size,
            npub=index.npub,
            field_name=index.domain.field.name,
            nc=nc,
            index_comms=np.stack(comms),
            lagrange_comm=np.stack(lag),
            g_affine=np.stack([aff(p) for p in g]),
            h_affine=aff(h),
            digest_limbs=int_to_limbs(index.digest(), NLIMBS),
            omega_rep=rep(omega),
            omega_last_rep=rep(pow(omega, n - 1, fs.p)),
            omega_zk_rep=np.stack(
                [rep(pow(omega, n - j, fs.p)) for j in range(1, ZK_ROWS + 1)]
            ),
            n_inv_rep=rep(pow(n, fs.p - 2, fs.p)),
            omega_pows_rep=np.stack(
                [rep(pow(omega, i, fs.p)) for i in range(max(index.npub, 1))]
            ),
            omega_chunk_rep=rep(pow(omega, N, fs.p)),
            lag_chunk_a_rep=lag_a,
            omega_iN_rep=om_iN,
            shifts_rep=np.stack([rep(k) for k in index.shifts])[:, None],
        )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "public", "w_comm", "z_comm", "s_comm", "rt_comm", "zl_comm",
        "t_comm", "evals", "ft_eval1", "lr", "delta", "sg", "z1", "z2",
        "u_sel", "u_hint", "prev_chals", "prev_sg",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class DeviceProofs:
    """B stacked proofs (all canonical little-endian limb arrays).

    nc below is the commitment chunk count (1 unless the domain exceeds
    the SRS); chunked commitments/openings are flattened [poly][chunk]."""

    public: jax.Array  # (B, npub, NLIMBS)
    w_comm: jax.Array  # (B, 15*nc, 2, NLIMBS)
    z_comm: jax.Array  # (B, nc, 2, NLIMBS)
    s_comm: jax.Array  # (B, NSORTED*nc, 2, NLIMBS) lookup sorted columns
    rt_comm: jax.Array  # (B, nc, 2, NLIMBS) runtime-table commitment
    zl_comm: jax.Array  # (B, nc, 2, NLIMBS)
    t_comm: jax.Array  # (B, 7*nc, 2, NLIMBS)
    evals: jax.Array  # (B, N_OPENED*nc = 56*nc, 2, NLIMBS)
    ft_eval1: jax.Array  # (B, NLIMBS): ft(zeta*omega), PARITY D5
    lr: jax.Array  # (B, k, 2, 2, NLIMBS)
    delta: jax.Array  # (B, 2, NLIMBS)
    sg: jax.Array  # (B, 2, NLIMBS)
    z1: jax.Array  # (B, NLIMBS)
    z2: jax.Array  # (B, NLIMBS)
    u_sel: jax.Array  # (B, 3) int32: one-hot SvdW branch for U
    u_hint: jax.Array  # (B, 4, NLIMBS): y, w0, w1, alpha groupmap hints
    # Pickles recursion accumulators carried by each proof (R may be 0):
    prev_chals: jax.Array  # (B, R, k, NLIMBS)
    prev_sg: jax.Array  # (B, R, 2, NLIMBS)

    @classmethod
    def from_host(cls, proofs: list[HostProof]) -> "DeviceProofs":
        from .prover_host import as_chunks

        def aff(pt):
            if pt is None:
                return np.zeros((2, NLIMBS), np.int32)
            return np.stack([int_to_limbs(pt[0], NLIMBS), int_to_limbs(pt[1], NLIMBS)])

        def affc(pcs):  # flatten [poly][chunk] commitment lists
            return np.stack([aff(p) for pc in pcs for p in as_chunks(pc)])

        def sc(x):
            return int_to_limbs(x, NLIMBS)

        R = len(proofs[0].prev_challenges)
        assert all(len(p.prev_challenges) == R for p in proofs), (
            "a batch must carry a uniform accumulator count (pad with the "
            "dummy accumulator chals=0, sg=g[0] at proving time)"
        )
        kk = len(proofs[0].prev_challenges[0][0]) if R else 1
        prev_chals = np.zeros((len(proofs), R, kk, NLIMBS), np.int32)
        prev_sg = np.zeros((len(proofs), R, 2, NLIMBS), np.int32)
        for b, p in enumerate(proofs):
            for r, (chals, sgpt) in enumerate(p.prev_challenges):
                prev_chals[b, r] = np.stack([sc(x) for x in chals])
                prev_sg[b, r] = aff(sgpt)
        u_sel, u_hint = ipa.u_hint_arrays([p.opening for p in proofs])
        return cls(
            u_sel=jnp.asarray(u_sel),
            u_hint=jnp.asarray(u_hint),
            prev_chals=jnp.asarray(prev_chals),
            prev_sg=jnp.asarray(prev_sg),
            public=jnp.asarray(
                np.stack([np.stack([sc(x) for x in p.public]) for p in proofs])
            ),
            w_comm=jnp.asarray(np.stack([affc(p.w_comm) for p in proofs])),
            z_comm=jnp.asarray(np.stack([affc([p.z_comm]) for p in proofs])),
            s_comm=jnp.asarray(np.stack([affc(p.s_comm) for p in proofs])),
            rt_comm=jnp.asarray(np.stack([affc([p.rt_comm]) for p in proofs])),
            zl_comm=jnp.asarray(np.stack([affc([p.zl_comm]) for p in proofs])),
            t_comm=jnp.asarray(
                np.stack([np.stack([aff(c) for c in p.t_comm]) for p in proofs])
            ),
            evals=jnp.asarray(
                np.stack(
                    [
                        np.stack([np.stack([sc(e0), sc(e1)]) for e0, e1 in p.evals])
                        for p in proofs
                    ]
                )
            ),
            ft_eval1=jnp.asarray(np.stack([sc(p.ft_eval1) for p in proofs])),
            lr=jnp.asarray(
                np.stack(
                    [
                        np.stack(
                            [np.stack([aff(L), aff(R)]) for L, R in p.opening.lr]
                        )
                        for p in proofs
                    ]
                )
            ),
            delta=jnp.asarray(np.stack([aff(p.opening.delta) for p in proofs])),
            sg=jnp.asarray(np.stack([aff(p.opening.sg) for p in proofs])),
            z1=jnp.asarray(np.stack([sc(p.opening.z1) for p in proofs])),
            z2=jnp.asarray(np.stack([sc(p.opening.z2) for p in proofs])),
        )


def _const(spec, x: int) -> jax.Array:
    return jnp.asarray(int_to_limbs(x % spec.p, ffl.REP_LIMBS))


@jax.jit
def verify(
    index: DeviceVerifierIndex,
    proofs: DeviceProofs,
    rand_weights: jax.Array,
    pub_comm_hint: jax.Array | None = None,
    bind_prechals: jax.Array | None = None,
) -> jax.Array:
    """Verify B proofs; returns a single bool.

    Kimchi shape (PARITY D3/D5): an FQ transcript derives beta/gamma/
    alpha/zeta and digests into an FR transcript that binds evaluations
    and derives v/u; the quotient identity is enforced THROUGH the one
    batched opening MSM via the ft linearization row (ft_eval0 = -S is
    computed here from the opened evals).

    pub_comm_hint: optional UNTRUSTED (B, nc, 2, NLIMBS) canonical
    affine host hint for the chunked blinded public commitment chunks
    [sum_i p_i L_i,0 + H, sum_i p_i L_i,1, ...]. When given, the hint
    is absorbed instead of running the 260-step on-device double-and-add
    (the longest sequential chain in the graph), and the per-chunk claim
    hint_j == sum_i p_i L_i,j (+H at j=0) is folded into the same
    batched MSM under verifier weights w^2 v^j (sound by Schwartz-Zippel:
    w is service randomness sampled after the proof is fixed).
    host_public_commitments() computes correct hints.

    bind_prechals: optional (B, k, NLIMBS) — additionally require the
    opening's raw 128-bit folding prechallenges to equal these (pickles
    step-proof linkage; see ipa.batch_verify).
    """
    curve = index.curve
    fs = curve.scalar
    B = proofs.z1.shape[0]
    npub = proofs.public.shape[1]
    nc = index.nc
    ps_fq = poseidon_spec(ipa.sponge_for(curve))
    ps_fr = poseidon_spec(fs.name)
    mask128 = jnp.asarray(ipa._MASK128)

    # ---- FQ transcript: group elements in, 128-bit challenges out ----
    R = proofs.prev_chals.shape[1]
    kk = proofs.prev_chals.shape[2]
    ops: list = [("absorb", jnp.asarray(index.digest_limbs))]
    for r in range(R):  # carried accumulator commitments (chals go to FR)
        ops += [
            ("absorb", proofs.prev_sg[:, r, 0]),
            ("absorb", proofs.prev_sg[:, r, 1]),
        ]
    # Public commitment absorbed as points (kimchi shape; PARITY D10):
    # chunk j of P_pub = sum_i p_i L_i,j over the index's chunked
    # Lagrange commitments, with kimchi's blinder-1 H offset riding on
    # chunk 0 only. Double-and-add is <1% of the main MSM's work; one
    # Fermat inversion normalizes all chunks to affine for the sponge.
    hint_wf = jnp.asarray(True)
    if npub and pub_comm_hint is not None:
        # untrusted host hint, bound via extra MSM rows (see below).
        # The w^2 binding argument only covers VALUE-level wrongness of a
        # well-formed point: out-of-range limbs break ffl's int32 bound
        # invariants and off-curve points make the RCB formulas
        # non-group, so well-formedness is checked here and folded into
        # the verdict: canonical 13-bit limbs (canon round-trip detects
        # values >= p) and y^2 == x^3 + b over the base field.
        fb = curve.base
        limb_ok = jnp.all((pub_comm_hint >= 0) & (pub_comm_hint < (1 << 13)))
        xr = ffl.from_canon(pub_comm_hint[..., 0, :])  # (B, nc, L)
        yr = ffl.from_canon(pub_comm_hint[..., 1, :])
        canon_ok = jnp.all(
            jnp.stack([ffl.canon(fb, xr), ffl.canon(fb, yr)], axis=-2)
            == pub_comm_hint
        )
        lhs = ffl.canon(fb, ffl.square(fb, yr))
        x3b = ffl.add(
            fb,
            ffl.mul(fb, ffl.square(fb, xr), xr),
            jnp.broadcast_to(_const(fb, curve.b), xr.shape).astype(jnp.int32),
        )
        curve_ok = jnp.all(lhs == ffl.canon(fb, x3b))
        hint_wf = limb_ok & canon_ok & curve_ok
        pub_xs = [pub_comm_hint[:, j, 0] for j in range(nc)]
        pub_ys = [pub_comm_hint[:, j, 1] for j in range(nc)]
    else:
        lag_all = jnp.asarray(index.lagrange_comm)  # (npub1, nc, 2, NLIMBS)
        h_rep = jc.from_affine(
            curve,
            ffl.from_canon(index.h_affine[0]),
            ffl.from_canon(index.h_affine[1]),
        )
        chunk_pts = []
        for j in range(nc):
            if npub:
                lag_pts = jc.from_affine(
                    curve,
                    ffl.from_canon(lag_all[:, j, 0]),
                    ffl.from_canon(lag_all[:, j, 1]),
                )  # (npub, 3, REP)
                bits = (proofs.public[..., None] >> jnp.arange(13)) & 1
                bits = bits.reshape(B, npub, -1)[..., ::-1]  # msb-first
                pts = jnp.broadcast_to(lag_pts[None], (B,) + lag_pts.shape)
                acc = jc.scalar_mul(curve, bits, pts)  # (B, npub, 3, REP)
                pub_pt = acc[:, 0]
                for i in range(1, npub):
                    pub_pt = jc.add(curve, pub_pt, acc[:, i])
            else:
                pub_pt = jc.identity(curve, (B,))
            if j == 0:
                pub_pt = jc.add(
                    curve, pub_pt, jnp.broadcast_to(h_rep, pub_pt.shape)
                )
            chunk_pts.append(pub_pt)
        stacked = jnp.stack(chunk_pts, axis=1)  # (B, nc, 3, REP)
        zinv = ffl.inv(curve.base, stacked[..., 2, :])
        xs_c = ffl.canon(
            curve.base, ffl.mul(curve.base, stacked[..., 0, :], zinv)
        )
        ys_c = ffl.canon(
            curve.base, ffl.mul(curve.base, stacked[..., 1, :], zinv)
        )
        pub_xs = [xs_c[:, j] for j in range(nc)]
        pub_ys = [ys_c[:, j] for j in range(nc)]
    for j in range(nc):
        ops += [("absorb", pub_xs[j]), ("absorb", pub_ys[j])]
    for i in range(COLUMNS * nc):
        ops += [
            ("absorb", proofs.w_comm[:, i, 0]),
            ("absorb", proofs.w_comm[:, i, 1]),
        ]
    for j in range(nc):
        ops += [
            ("absorb", proofs.rt_comm[:, j, 0]),
            ("absorb", proofs.rt_comm[:, j, 1]),
        ]
    ops += [("squeeze",)]  # joint combiner (endo)
    for q in range(NSORTED * nc):
        ops += [
            ("absorb", proofs.s_comm[:, q, 0]),
            ("absorb", proofs.s_comm[:, q, 1]),
        ]
    ops += [("squeeze",), ("squeeze",)]  # beta, gamma (perm + lookup)
    for j in range(nc):
        ops += [("absorb", proofs.z_comm[:, j, 0]), ("absorb", proofs.z_comm[:, j, 1])]
    for j in range(nc):
        ops += [("absorb", proofs.zl_comm[:, j, 0]), ("absorb", proofs.zl_comm[:, j, 1])]
    ops += [("squeeze",)]  # alpha
    for i in range(T_CHUNKS * nc):
        ops += [
            ("absorb", proofs.t_comm[:, i, 0]),
            ("absorb", proofs.t_comm[:, i, 1]),
        ]
    ops += [("squeeze",)]  # zeta
    ops += [("squeeze",)]  # fq_digest -> FR sponge
    sq, fq_sponge = poseidon.run_transcript(ps_fq, ops, batch_shape=(B,))
    beta, gamma = [ffl.from_canon(x & mask128) for x in sq[1:3]]
    # joint/alpha/zeta go through the endo map (kimchi ScalarChallenge)
    joint, alpha, zeta = [
        ipa.endo_to_field_device(fs, curve.endo_scalar, x & mask128)
        for x in (sq[0], sq[3], sq[4])
    ]
    fq_digest = sq[5]  # canonical base-field limbs

    mul = lambda a, b: ffl.mul(fs, a, b)
    add = lambda a, b: ffl.add(fs, a, b)
    sub = lambda a, b: ffl.sub(fs, a, b)

    # zeta^n by repeated squaring, capturing zeta^N on the way (N = the
    # SRS chunk size; zeta^n = (zeta^N)^nc since nc is a power of two)
    logN = index.log_n - (nc.bit_length() - 1)
    zn = zeta
    zN = zeta if logN == 0 else None
    for s_i in range(index.log_n):
        zn = ffl.square(fs, zn)
        if s_i + 1 == logN:
            zN = zn
    one = jnp.broadcast_to(ffl.ones(fs), zeta.shape).astype(jnp.int32)
    zh = sub(zn, one)  # Z_H(zeta)
    zeta_w = mul(zeta, jnp.asarray(index.omega_rep)[None])

    # ---- scalar identity pieces at zeta (opened evals) ----
    # chunk-combine: f(y) = sum_j y^(N j) e_j(y) per opened polynomial;
    # (zeta*omega)^N = zeta^N * omega^N with omega^N an nc-th root of 1.
    ev_flat = ffl.from_canon(proofs.evals)  # (B, 56*nc, 2, L)
    if nc > 1:
        zwN = mul(zN, jnp.asarray(index.omega_chunk_rep)[None])
        p0 = jnp.stack(ipa._powers(fs, zN, nc))  # (nc, B, L)
        p1 = jnp.stack(ipa._powers(fs, zwN, nc))
        wts = jnp.moveaxis(jnp.stack([p0, p1], axis=1), 2, 0)  # (B,nc,2,L)
        evg = ev_flat.reshape(B, N_OPENED, nc, 2, ffl.REP_LIMBS)
        terms = mul(evg, wts[:, None])  # (B, 56, nc, 2, L)
        ev = terms[:, :, 0]
        for j in range(1, nc):
            ev = add(ev, terms[:, :, j])
    else:
        zwN = zn
        ev = ev_flat
    off = 0
    w_z = [ev[:, i, 0] for i in range(COLUMNS)]
    w_zw = [ev[:, i, 1] for i in range(COLUMNS)]
    off += COLUMNS
    z_z = ev[:, off, 0]
    z_zw = ev[:, off, 1]
    off += 1
    sig_off = off
    sig_z = [ev[:, off + j, 0] for j in range(PERMUTS - 1)]
    off += PERMUTS - 1
    coeff_z = [ev[:, off + j, 0] for j in range(COEFFS)]
    off += COEFFS
    sel_z = {g_: ev[:, off + i, 0] for i, g_ in enumerate(G.GATE_ORDER)}
    off += len(G.GATE_ORDER)
    s_z = [ev[:, off + q, 0] for q in range(NSORTED)]
    s_zw = [ev[:, off + q, 1] for q in range(NSORTED)]
    off += NSORTED
    zl_z, zl_zw = ev[:, off, 0], ev[:, off, 1]
    tj_z, tj_zw = ev[:, off + 1, 0], ev[:, off + 1, 1]
    qlk_z = ev[:, off + 2, 0]
    rt_z = ev[:, off + 3, 0]
    rtsel_z = ev[:, off + 4, 0]

    # Lagrange evals L_i(x) = omega^i * Z_H(x) / (n * (x - omega^i)) at
    # both opening points; Z_H(zeta*omega) = Z_H(zeta) since omega^n = 1.
    # ALL Lagrange denominators (public rows, L_0, L_{n-ZK_ROWS},
    # L_{n-1}) invert in ONE merged Fermat chain: each ffl.inv is ~380
    # sequential multiplies regardless of lane count, and separate
    # chains were a measurable slice of the verify graph's critical
    # path on the latency-bound transcript section.
    n_inv = jnp.asarray(index.n_inv_rep)
    omega_zk = jnp.asarray(index.omega_zk_rep)  # (ZK_ROWS, L)
    omega_last = jnp.asarray(index.omega_last_rep)[None]
    zml = sub(zeta, jnp.broadcast_to(omega_last, zeta.shape).astype(jnp.int32))
    extra_dens = jnp.stack(
        [
            sub(zeta, one),
            sub(zeta, jnp.broadcast_to(omega_zk[ZK_ROWS - 1][None], zeta.shape).astype(jnp.int32)),
            zml,
        ]
    )  # (3, B, L)
    pub_eval = ffl.zeros(fs, (B,))
    pub_eval_w = ffl.zeros(fs, (B,))
    if npub:
        omega_pows = jnp.asarray(index.omega_pows_rep)  # (npub, L)
        dens = sub(zeta[None], omega_pows[:, None])  # (npub, B, L)
        dens_w = sub(zeta_w[None], omega_pows[:, None])
        all_inv = ffl.inv(fs, jnp.concatenate([dens, dens_w, extra_dens], axis=0))
        dens_inv = all_inv[: 2 * npub]
    else:
        all_inv = ffl.inv(fs, extra_dens)
    inv_zm1, inv_zmzk, inv_zml = (
        all_inv[-3],
        all_inv[-2],
        all_inv[-1],
    )
    # per-chunk public openings via the closed-form chunk Lagrange eval
    # (L_i)_j(y) = A_ij (y^N - omega^(iN)) / (n (y - omega^i)) — for
    # nc == 1 this reduces to the familiar omega^i Z_H(y)/(n (y-omega^i))
    pub_chunk_evs = [
        (ffl.zeros(fs, (B,)), ffl.zeros(fs, (B,))) for _ in range(nc)
    ]
    if npub:
        lag_a = jnp.asarray(index.lag_chunk_a_rep)  # (npub, nc, L)
        om_iN = jnp.asarray(index.omega_iN_rep)  # (npub, L)
        num0 = sub(
            jnp.broadcast_to(zN[None], (npub,) + zN.shape).astype(jnp.int32),
            om_iN[:, None],
        )  # (npub, B, L)
        num1 = sub(
            jnp.broadcast_to(zwN[None], (npub,) + zwN.shape).astype(jnp.int32),
            om_iN[:, None],
        )
        for j in range(nc):
            ez = ffl.zeros(fs, (B,))
            ew = ffl.zeros(fs, (B,))
            for i in range(npub):
                pv = ffl.from_canon(proofs.public[:, i])
                li = mul(
                    mul(mul(dens_inv[i], num0[i]), lag_a[i, j][None]),
                    n_inv[None],
                )
                ez = add(ez, mul(li, pv))
                li_w = mul(
                    mul(mul(dens_inv[npub + i], num1[i]), lag_a[i, j][None]),
                    n_inv[None],
                )
                ew = add(ew, mul(li_w, pv))
            pub_chunk_evs[j] = (ez, ew)
        # combined (full-polynomial) public evals for the gate identity
        if nc > 1:
            zNj0 = ipa._powers(fs, zN, nc)
            zNj1 = ipa._powers(fs, zwN, nc)
            for j in range(nc):
                pub_eval = add(pub_eval, mul(zNj0[j], pub_chunk_evs[j][0]))
                pub_eval_w = add(pub_eval_w, mul(zNj1[j], pub_chunk_evs[j][1]))
        else:
            pub_eval, pub_eval_w = pub_chunk_evs[0]

    # gate constraints via the shared expressions (device field ops)
    from ..fields.params import FP, FQ
    from .circuit import gate_ctx

    gctx = gate_ctx(FP if index.field_name == "fp" else FQ)
    dev_ops = G.FieldOps(
        add=add,
        sub=sub,
        mul=mul,
        const=lambda v: jnp.broadcast_to(_const(fs, v), zeta.shape).astype(
            jnp.int32
        ),
    )  # poseidon-spec constants are shared per field, safe to bake
    alpha_pows = ipa._powers(fs, alpha, N_ALPHAS)
    row = G.RowView(w=w_z, w_next=w_zw, c=coeff_z)
    gate = G.all_gate_constraints(
        dev_ops, row, sel_z, pub_eval, gctx, alpha_pows
    )

    # batched permutation products (sigma[6] lives in ft: den over 6)
    w_stack = ev[:, :PERMUTS, 0].transpose(1, 0, 2)  # (7, B, L)
    sig_stack = ev[:, sig_off : sig_off + PERMUTS - 1, 0].transpose(1, 0, 2)
    k_stack = jnp.asarray(index.shifts_rep)  # (7, 1, L)
    num_f = add(add(w_stack, mul(mul(beta[None], k_stack), zeta[None])), gamma[None])
    den_f = add(add(w_stack[: PERMUTS - 1], mul(beta[None], sig_stack)), gamma[None])

    def tree_prod(x):
        n = x.shape[0]
        while n > 1:
            half = n // 2
            red = mul(x[:half], x[half : 2 * half])
            if n % 2:
                red = jnp.concatenate([red, x[-1:]], axis=0)
                n = half + 1
            else:
                n = half
            x = red
        return x[0]

    num = tree_prod(num_f)
    d5 = tree_prod(den_f)  # prod over the 6 opened sigmas
    # zkpm(zeta) = prod_j (zeta - omega^(n-j)), j = 1..ZK_ROWS
    zkpm = sub(zeta, jnp.broadcast_to(omega_zk[0][None], zeta.shape).astype(jnp.int32))
    for j in range(1, ZK_ROWS):
        zkpm = mul(zkpm, sub(zeta, omega_zk[j][None]))
    # scalar part of the permutation recurrence: the sigma6 term moves to
    # ft as perm_ft * sigma6(X)
    w6_g = add(w_stack[PERMUTS - 1], gamma)
    p2 = mul(sub(mul(z_z, num), mul(mul(z_zw, d5), w6_g)), zkpm)
    # ft's sigma6 coefficient: -alpha^PERM zkpm beta z(zw) D5
    perm_ft = ffl.neg(
        fs, mul(mul(mul(mul(alpha_pows[ALPHA_PERM], zkpm), beta), z_zw), d5)
    )
    # L_0(zeta)
    l0 = mul(mul(inv_zm1, zh), n_inv[None])
    p1 = mul(l0, sub(z_z, one))
    # L_{n-ZK_ROWS}(zeta) boundary: z(omega^(n-ZK_ROWS)) = 1
    w_zk = omega_zk[ZK_ROWS - 1][None]
    lzk = mul(mul(mul(inv_zmzk, zh), w_zk), n_inv[None])
    p3 = mul(lzk, sub(z_z, one))

    # lookup constraints at zeta (kimchi shape)
    one_pl = add(one, beta)  # 1 + beta
    gpb = mul(gamma, one_pl)
    pb2 = mul(one_pl, one_pl)
    one_pb4 = mul(pb2, pb2)  # (1+beta)^LOOKUPS_PER_ROW
    j2 = mul(joint, joint)
    j_pows = [one, joint, j2, mul(j2, joint)]
    F_z = G.lookup_f_product(dev_ops, row, sel_z, qlk_z, j_pows, gamma)
    A_lk = add(gpb, add(s_z[0], mul(beta, s_zw[0])))
    for q in range(1, NSORTED):
        A_lk = mul(A_lk, add(gpb, add(s_z[q], mul(beta, s_zw[q]))))
    B_lk = mul(
        mul(one_pb4, F_z),
        add(gpb, add(tj_z, mul(beta, tj_zw))),
    )
    # L_{n-1}(zeta) = omega^{n-1} * zh / (n (zeta - omega^{n-1}))
    lnm1 = mul(mul(mul(inv_zml, zh), omega_last), n_inv[None])
    lk_rec = mul(zml, sub(mul(zl_zw, A_lk), mul(zl_z, B_lk)))
    lk_0 = mul(l0, sub(zl_z, one))
    lk_last = mul(lnm1, sub(zl_z, one))
    lk_overlaps = [
        mul(lnm1, sub(s_z[q], s_zw[q + 1])) for q in range(NSORTED - 1)
    ]
    lk_rt = mul(sub(one, rtsel_z), rt_z)

    # S = the all-scalar part of the quotient identity; the committed
    # remainder is ft (sigma6 + t chunks), so ft(zeta) must equal -S.
    S = add(
        gate,
        add(
            mul(alpha_pows[ALPHA_PERM], p2),
            add(
                mul(alpha_pows[ALPHA_PERM + 1], p1),
                mul(alpha_pows[ALPHA_PERM + 2], p3),
            ),
        ),
    )
    S = add(
        S,
        add(
            add(
                mul(alpha_pows[ALPHA_LOOKUP], lk_rec),
                mul(alpha_pows[ALPHA_LOOKUP + 1], lk_0),
            ),
            mul(alpha_pows[ALPHA_LOOKUP + 2], lk_last),
        ),
    )
    for q in range(NSORTED - 1):
        S = add(S, mul(alpha_pows[ALPHA_LOOKUP + 3 + q], lk_overlaps[q]))
    S = add(S, mul(alpha_pows[ALPHA_LOOKUP + 3 + NSORTED - 1], lk_rt))
    ft0 = ffl.neg(fs, S)
    # ft's t-chunk coefficients -Z_H(zeta) zeta^(N i) and sigma6-chunk
    # coefficients perm_ft zeta^(N j): the zeta-collapse of the chunked
    # linearization (prover_host.linearization_ft)
    t_scales = []
    zp = jnp.broadcast_to(ffl.ones(fs), zeta.shape).astype(jnp.int32)
    for i in range(T_CHUNKS * nc):
        t_scales.append(ffl.neg(fs, mul(zh, zp)))
        if i + 1 < T_CHUNKS * nc:
            zp = mul(zp, zN)
    sigma6_scales = [perm_ft]
    for j in range(1, nc):
        sigma6_scales.append(mul(sigma6_scales[-1], zN))

    # ---- FR transcript: evaluations bind in the scalar field ----
    frops: list = [("absorb", ffl.canon(fs, ffl.from_canon(fq_digest)))]
    for r in range(R):
        for j in range(kk):
            frops.append(("absorb", proofs.prev_chals[:, r, j]))
    for ez, ew in pub_chunk_evs:
        frops += [
            ("absorb", ffl.canon(fs, ez)),
            ("absorb", ffl.canon(fs, ew)),
        ]
    frops += [("absorb", proofs.ft_eval1)]
    for i in range(N_OPENED * nc):
        frops += [
            ("absorb", proofs.evals[:, i, 0]),
            ("absorb", proofs.evals[:, i, 1]),
        ]
    frops += [("squeeze",), ("squeeze",)]  # v, u
    (v_sq, u_sq), _ = poseidon.run_transcript(ps_fr, frops, batch_shape=(B,))
    v = ipa.endo_to_field_device(fs, curve.endo_scalar, v_sq & mask128)
    u = ipa.endo_to_field_device(fs, curve.endo_scalar, u_sq & mask128)

    # ---- batched opening via one MSM ----
    eval_points = jnp.stack(
        [ffl.canon(fs, zeta), ffl.canon(fs, zeta_w)], axis=1
    )  # (B, 2, 20)
    # index_comms (37, nc, 2, L) flattened to [entry][chunk] rows
    idx_flat = jnp.asarray(index.index_comms).reshape(-1, 2, NLIMBS)
    n_idx = idx_flat.shape[0]
    idx_comms = jnp.broadcast_to(idx_flat[None], (B, n_idx, 2, NLIMBS))
    # order must match prover_host: [prev accumulators], public chunks,
    # ft, then per-chunk rows of w, z, sigma0-5+coeff+sel (index),
    # s0..s4, zl, t_joint, qlk, rt, rt_sel. public/ft/t_joint slots hold
    # the identity; their real contributions enter as virtual rows
    # (linear combinations of L_i / sigma6 / t / table-column points).
    zero_rows = jnp.zeros((B, nc + 1, 2, NLIMBS), jnp.int32)
    tj_zero = jnp.zeros((B, nc, 2, NLIMBS), jnp.int32)
    n_sel = len(G.GATE_ORDER)
    commitments = jnp.concatenate(
        ([proofs.prev_sg] if R else [])
        + [
            zero_rows,
            proofs.w_comm,
            proofs.z_comm,
            idx_comms[:, : (PERMUTS - 1) * nc],
            idx_comms[:, PERMUTS * nc : (PERMUTS + COEFFS + n_sel) * nc],
            proofs.s_comm,
            proofs.zl_comm,
            tj_zero,
            idx_comms[:, -nc:],  # q_lookup chunks
            proofs.rt_comm,
            idx_comms[:, -2 * nc : -nc],  # rt_sel chunks
        ],
        axis=1,
    )  # (B, R + (nc+1) + 56*nc, 2, NLIMBS)
    pub_rows = jnp.stack(
        [
            jnp.stack([ffl.canon(fs, ez), ffl.canon(fs, ew)], axis=1)
            for ez, ew in pub_chunk_evs
        ],
        axis=1,
    )  # (B, nc, 2, NLIMBS)
    ft_row = jnp.stack([ffl.canon(fs, ft0), proofs.ft_eval1], axis=1)[:, None]
    front = [pub_rows, ft_row]
    if R:
        # verifier-computed accumulator rows: b_poly(chals, .) at
        # (zeta, zeta*omega); opening them against sg decides the
        # deferred claim sg == <s(chals), G> (README.md:534-544)
        ch = ffl.from_canon(proofs.prev_chals)  # (B, R, kk, L)
        pts = jnp.stack([zeta, zeta_w], axis=1)  # (B, 2, L)
        xp = jnp.broadcast_to(
            pts[:, None], (B, R) + pts.shape[1:]
        ).astype(jnp.int32)
        one_p = jnp.broadcast_to(ffl.ones(fs), xp.shape).astype(jnp.int32)
        bval = one_p
        for i in range(kk):
            term = add(one_p, mul(ch[:, :, kk - 1 - i][:, :, None], xp))
            bval = mul(bval, term)
            if i + 1 < kk:
                xp = ffl.square(fs, xp)
        front = [ffl.canon(fs, bval)] + front
    evals_all = jnp.concatenate(front + [proofs.evals], axis=1)

    # virtual rows: public chunk j = sum_i p_i L_i,j; ft = the
    # zeta-collapsed perm_ft*sigma6 + t part; t_joint chunk j =
    # col0_j + joint (col1_j + rt_j) + joint^2 col2_j + joint^3 ids_j
    lag = jnp.asarray(index.lagrange_comm)  # (npub1, nc, 2, NLIMBS)
    idx_all = jnp.asarray(index.index_comms)  # (37, nc, 2, NLIMBS)
    virtual = []
    for j in range(nc):
        for i in range(npub):
            virtual.append(
                (R + j, lag[i, j], ffl.from_canon(proofs.public[:, i]))
            )
    ft_idx = R + nc
    for j in range(nc):
        virtual.append((ft_idx, idx_all[PERMUTS - 1, j], sigma6_scales[j]))
    for i in range(T_CHUNKS * nc):
        virtual.append((ft_idx, proofs.t_comm[:, i], t_scales[i]))
    # opened rows after ft: w(15) z(1) sigma(6) coeff(15) sel(9) s(5)
    # zl(1) = 52 polys, each nc chunk rows, then the t_joint chunk rows
    tj_row0 = R + nc + 1 + (COLUMNS + 1 + (PERMUTS - 1) + COEFFS + n_sel + NSORTED + 1) * nc
    tcol0 = PERMUTS + COEFFS + n_sel  # index_comms entry of table col0
    one_sc = jnp.broadcast_to(ffl.ones(fs), zeta.shape).astype(jnp.int32)
    for j in range(nc):
        virtual.append((tj_row0 + j, idx_all[tcol0, j], one_sc))
        virtual.append((tj_row0 + j, idx_all[tcol0 + 1, j], joint))
        virtual.append((tj_row0 + j, proofs.rt_comm[:, j], joint))
        virtual.append((tj_row0 + j, idx_all[tcol0 + 2, j], j2))
        virtual.append((tj_row0 + j, idx_all[tcol0 + 3, j], j_pows[3]))

    # hint binding: w^2 v^j * (sum_i p_i L_i,j (+H at j=0) - hint_j)
    # folds into the MSM. w^2 is a monomial no other row's coefficient
    # carries and v separates the chunks, so a nonzero hint defect
    # survives the random combination w.h.p.
    extra_pairs = []
    if npub and pub_comm_hint is not None:
        w_rep = ffl.from_canon(rand_weights[:, 0])
        wsq = ffl.mul(fs, w_rep, w_rep)  # (B, L)
        wv = ipa._powers(fs, v, nc) if nc > 1 else None
        for j in range(nc):
            wj = wsq if j == 0 else ffl.mul(fs, wsq, wv[j])
            for i in range(npub):
                extra_pairs.append(
                    (lag[i, j], ffl.mul(fs, wj, ffl.from_canon(proofs.public[:, i])))
                )
            if j == 0:
                extra_pairs.append((jnp.asarray(index.h_affine), wj))
            extra_pairs.append((pub_comm_hint[:, j], ffl.neg(fs, wj)))

    openings = ipa.DeviceOpenings(
        commitments=commitments,
        evals=evals_all,
        eval_points=eval_points,
        lr=proofs.lr,
        delta=proofs.delta,
        sg=proofs.sg,
        z1=proofs.z1,
        z2=proofs.z2,
        u_sel=proofs.u_sel,
        u_hint=proofs.u_hint,
    )
    ok = ipa.batch_verify(
        curve,
        jnp.asarray(index.g_affine),
        jnp.asarray(index.h_affine),
        openings,
        rand_weights,
        sponge=fq_sponge,
        v=v,
        u=u,
        virtual_rows=tuple(virtual),
        extra_pairs=tuple(extra_pairs),
        bind_prechals=bind_prechals,
    )
    return jnp.logical_and(ok, hint_wf)


def host_public_commitments(
    index: DeviceVerifierIndex, publics: "list[list[int]]"
) -> jax.Array:
    """(B, nc, 2, NLIMBS) canonical affine hints: chunk j of the blinded
    public commitment sum_i p_i L_i,j (+H on chunk 0), for
    verify(pub_comm_hint=...). Host big-int arithmetic (~ms); the device
    re-binds the claims inside the batched MSM, so hints are untrusted."""
    import numpy as np

    from ..curves import host as hc
    from ..fields.params import limbs_to_int

    curve = index.curve
    nc = index.nc
    lag = np.asarray(index.lagrange_comm)  # (npub1, nc, 2, NLIMBS)
    h_aff = np.asarray(index.h_affine)
    lag_pts = [
        [
            (limbs_to_int(lag[i, j, 0]), limbs_to_int(lag[i, j, 1]))
            for j in range(nc)
        ]
        for i in range(lag.shape[0])
    ]
    h_pt = (limbs_to_int(h_aff[0]), limbs_to_int(h_aff[1]))
    out = np.zeros((len(publics), nc, 2, NLIMBS), np.int32)
    for b, pubs in enumerate(publics):
        for j in range(nc):
            acc = h_pt if j == 0 else None
            for p_i, L_i in zip(pubs, lag_pts):
                acc = hc.add(curve, acc, hc.mul(curve, int(p_i), L_i[j]))
            assert acc is not None, "public commitment chunk is the identity"
            out[b, j, 0] = int_to_limbs(acc[0], NLIMBS)
            out[b, j, 1] = int_to_limbs(acc[1], NLIMBS)
    return jnp.asarray(out)
