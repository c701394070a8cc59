"""Host (CPU, big-int) kimchi-style prover + verifier index construction.

Produces the proof fixtures that the TPU verifier (kimchi/verifier.py)
consumes — fulfilling SURVEY §4's mandate to build our own fixture corpus
(the reference ships zero test vectors). The transcript here is the
protocol ground truth; the device verifier reproduces it bit-exactly.

Gate constraints come from kimchi/gates.py (generic + poseidon +
complete_add, selector-weighted, alpha-combined), followed by the
7-column permutation argument; the quotient is computed on a coset of
the 8n domain and split into 7 chunks (kimchi's split size).

Transcript — kimchi's two-sponge shape (fq-sponge over the curve's BASE
field for group elements, fr-sponge over the SCALAR field for
evaluations; PARITY D3):

  fq-sponge:
    absorb index digest
    absorb accumulator sg commitments (x, y each)
    absorb the public commitment sum_i p_i L_i + H (x, y) — kimchi's
        blinded public commitment (blinder 1; PARITY D10)
    absorb w_comm[15], rt_comm (x, y each)
    squeeze joint_combiner                 (endo)
    absorb s_comm[NSORTED] (x, y each)
    squeeze beta, gamma                    (raw 128-bit; shared by the
        permutation and lookup arguments, as in kimchi)
    absorb z_comm, zl_comm; squeeze alpha  (endo)
    absorb t_comm[7]; squeeze zeta         (endo)
    squeeze fq_digest                      (full element)
  fr-sponge:
    absorb fq_digest (reduced mod r)
    absorb accumulator challenge scalars (native)
    absorb public_eval(zeta), public_eval(zeta*omega)
    absorb ft_eval1
    absorb all evals in OPEN_ORDER at (zeta, zeta*omega) (native)
    squeeze v (polyscale, endo), u (evalscale, endo)
  ... IPA opening continues the FQ sponge (commitment/ipa.py).

Verifier equation — kimchi's ft linearization (PARITY D5): sigma[6] and
the t chunks are NOT opened; they fold into the linearization polynomial
  ft(X) = -alpha^PERM * zkpm(zeta) * beta * z(zeta*omega) * D5 * sigma6(X)
          - Z_H(zeta) * sum_i zeta^(n i) t_i(X),
  D5 = prod_{j<6} (w_j(zeta) + beta sigma_j(zeta) + gamma),
opened at (zeta, zeta*omega) with ft_eval0 computed by the verifier from
the opened evals (ft_eval0 = -S, S = all-scalar part of the quotient
identity) and ft_eval1 supplied by the prover. The public polynomial is
its own opening row (commitment = sum_i p_i L_i over the index's
Lagrange commitments on the verifier side).
"""

from __future__ import annotations

import dataclasses

from ..commitment import ipa
from ..curves.host import CurveSpec
from ..hash.poseidon import HostSponge
from ..hash.poseidon_params import poseidon_spec
from . import gates as G
from .circuit import (
    COEFFS,
    COLUMNS,
    PERMUTS,
    ZK_ROWS,
    Circuit,
    gate_ctx,
    shifts,
)
from .domain import Domain, coset_fft, coset_ifft, fft, ifft, poly_eval

T_CHUNKS = 7
NSORTED = G.NSORTED  # 5 sorted-multiset columns (kimchi shape)
# lookup-opened rows: s0..s4, z_lookup, joint table, q_lookup, runtime
# table, runtime selector
N_LOOKUP_OPENED = NSORTED + 5  # 10
# opening order (prover-opened rows): w15, z, sigma6 (sigma[6] lives in
# ft), coeffs15, sel(9 gates), s0..s4, z_lookup, t_joint, q_lookup, rt,
# rt_sel. The t chunks fold into ft and are not opened (PARITY D5); the
# t_joint row's commitment is the j-combination of index/rt commitments
# and enters the MSM as virtual rows.
N_OPENED = (
    COLUMNS + 1 + (PERMUTS - 1) + COEFFS + len(G.GATE_ORDER) + N_LOOKUP_OPENED
)  # 56
# verifier-computed rows prepended to the v-combine, after any carried
# accumulators: [public, ft]
N_VERIFIER_ROWS = 2
# alpha powers: gates, then permutation (recurrence*zkpm, L0 boundary,
# L_{n-ZK_ROWS} boundary), then the 8 lookup constraints (aggregation
# recurrence, Z_L(0)=1, Z_L(n-1)=1, 4 sorted-column overlaps, runtime
# support)
ALPHA_PERM = G.N_GATE_CONSTRAINTS
ALPHA_LOOKUP = ALPHA_PERM + 3
N_ALPHAS = ALPHA_LOOKUP + 4 + NSORTED - 1


def n_chunks(n: int, srs_len: int) -> int:
    """Commitment chunk count: a degree < n polynomial over an SRS of
    srs_len points splits into ceil(n/srs_len) SRS-sized chunks —
    kimchi's chunked commitments for domains larger than the SRS (the
    real Pickles shapes: Step 2^18 / Wrap 2^17 over the 2^16 SRS,
    reference README.md:485-486)."""
    return max(1, -(-n // srs_len))


def as_chunks(x) -> list:
    """A commitment stored as a bare point (c == 1) or list of chunk
    points (c > 1) -> uniform list view."""
    return x if isinstance(x, list) else [x]


def poly_chunks(coeffs: list, N: int, c: int) -> list[list]:
    """Split a coefficient vector into c chunks of (at most) N."""
    if c == 1:
        return [coeffs]
    return [coeffs[j * N : (j + 1) * N] for j in range(c)]


def combine_chunk_evals(
    evals_flat: list, nc: int, zeta: int, zeta_w: int, N: int, ps: int
) -> list:
    """Full-polynomial openings from flattened per-chunk openings:
    f(y) = sum_j y^(N j) e_j(y) at each point, per opened polynomial."""
    if nc == 1:
        return evals_flat
    zN, zwN = pow(zeta, N, ps), pow(zeta_w, N, ps)
    out = []
    for i in range(0, len(evals_flat), nc):
        e0 = e1 = 0
        p0 = p1 = 1
        for j in range(nc):
            e0 += p0 * evals_flat[i + j][0]
            e1 += p1 * evals_flat[i + j][1]
            p0 = p0 * zN % ps
            p1 = p1 * zwN % ps
        out.append((e0 % ps, e1 % ps))
    return out


def lagrange_chunk_eval(
    dom: Domain, i: int, j: int, N: int, y: int
) -> int:
    """Evaluation of the j-th SRS-sized chunk of the Lagrange basis
    polynomial L_i at y (closed form — no O(n) work):
      L_i(X) = sum_d (a^(n-d)/n) X^d  with a = omega^i, so
      (L_i)_j(y) = a^(n-jN-N+1) (y^N - a^N) / (n (y - a)).
    For N = n, j = 0 this is the familiar a (y^n - 1)/(n (y - a))."""
    p = dom.field.p
    n = dom.n
    a = pow(dom.omega, i, p)
    num = pow(a, n - j * N - N + 1, p) * ((pow(y, N, p) - pow(a, N, p)) % p)
    den = n * (y - a) % p
    return num * pow(den, p - 2, p) % p


def commit_chunks(curve, g, h, coeffs: list, blinds, N: int, c: int):
    """Per-chunk Pedersen commitments; returns a bare point when c == 1
    (bit-compatible with the unchunked format) else the chunk list."""
    bl = blinds if isinstance(blinds, list) else [blinds] * c
    out = [
        ipa.host_commit(curve, g, h, ch, b)
        for ch, b in zip(poly_chunks(coeffs, N, c), bl)
    ]
    return out[0] if c == 1 else out


@dataclasses.dataclass
class VerifierIndexHost:
    curve: CurveSpec
    domain: Domain
    npub: int
    sigma_comm: list  # 7 affine points (each a chunk list when c > 1)
    coeff_comm: list  # 15 affine points
    sel_comm: dict  # gate name -> affine point
    table_comm: list  # JOINT_WIDTH col comms + ids comm + rt_sel comm
    qlk_comm: object  # legacy lookup selector commitment
    shifts: tuple[int, ...]
    sigma_coeffs: list
    coeff_coeffs: list
    sel_coeffs: dict
    table_coeffs: list  # JOINT_WIDTH col coeffs + ids + rt_sel
    qlk_coeffs: list
    rt_rows: object  # domain rows occupied by the runtime table
    # SRS length backing the commitments; None means domain.n (c = 1).
    srs_len: int | None = None

    @property
    def chunk_size(self) -> int:
        return self.srs_len if self.srs_len else self.domain.n

    @property
    def chunks(self) -> int:
        return n_chunks(self.domain.n, self.chunk_size)

    def digest(self) -> int:
        """Poseidon hash of all index commitments (binds the circuit)."""
        sponge = HostSponge(poseidon_spec(ipa.sponge_for(self.curve)))
        pts = (
            self.sigma_comm
            + self.coeff_comm
            + [self.sel_comm[g] for g in G.GATE_ORDER]
            + list(self.table_comm)
            + [self.qlk_comm]
        )
        for pc in pts:
            for pt in as_chunks(pc):
                sponge.absorb(pt[0] if pt else 0)
                sponge.absorb(pt[1] if pt else 0)
        sponge.absorb(self.domain.n)
        sponge.absorb(self.npub)
        return sponge.squeeze()


@dataclasses.dataclass
class HostProof:
    w_comm: list  # 15 affine
    z_comm: tuple
    s_comm: list  # NSORTED lookup sorted-column commitments
    rt_comm: tuple  # runtime-table commitment (zero poly if unused)
    zl_comm: tuple  # lookup aggregation
    t_comm: list  # 7 affine (folded into ft by the verifier, not opened)
    evals: list  # N_OPENED x 2 scalar ints, OPEN_ORDER
    ft_eval1: int  # ft(zeta * omega) — the linearization's second point
    opening: ipa.HostOpeningProof
    public: list[int]
    # Pickles recursion accumulators this proof carries: [(chals, sg)].
    # Each is a previous proof's IPA folding challenges + its `sg`
    # commitment (reference README.md:534-544); the verifier re-opens
    # b_poly(chals, .) against sg inside the one batched MSM, which
    # decides the deferred claim sg == <s(chals), G>.
    prev_challenges: list = dataclasses.field(default_factory=list)

    def accumulator(self) -> tuple[list[int], tuple[int, int]]:
        """This proof's own accumulator (chals, sg) for the next proof."""
        return (self.opening.chals, self.opening.sg)


def setup(
    circuit: Circuit, curve: CurveSpec, g: list, h, srs_len: int | None = None
) -> VerifierIndexHost:
    assert circuit.domain.field is curve.scalar
    n = circuit.n
    N = min(len(g), n) if srs_len is None else min(srs_len, n)
    assert N & (N - 1) == 0, "SRS chunk size must be a power of two"
    c = n_chunks(n, N)
    g = g[:N]
    assert len(g) == N, "SRS smaller than requested chunk size"
    sigma_coeffs = [ifft(circuit.domain, s) for s in circuit.sigma_evals()]
    coeff_coeffs = circuit.coeff_coeffs()
    sel_coeffs = circuit.sel_coeffs()
    table_coeffs = [
        ifft(circuit.domain, col) for col in circuit.table_column_evals()
    ]  # col0, col1, col2, ids, rt_sel
    qlk_coeffs = ifft(circuit.domain, circuit.q_lookup_evals())

    def cc(coeffs):
        return commit_chunks(curve, g, h, coeffs, 0, N, c)

    return VerifierIndexHost(
        curve=curve,
        domain=circuit.domain,
        npub=circuit.npub,
        sigma_comm=[cc(co) for co in sigma_coeffs],
        coeff_comm=[cc(co) for co in coeff_coeffs],
        sel_comm={k: cc(co) for k, co in sel_coeffs.items()},
        table_comm=[cc(co) for co in table_coeffs],
        qlk_comm=cc(qlk_coeffs),
        shifts=shifts(circuit.domain.field, circuit.domain.log_size),
        sigma_coeffs=sigma_coeffs,
        coeff_coeffs=coeff_coeffs,
        sel_coeffs=sel_coeffs,
        table_coeffs=table_coeffs,
        qlk_coeffs=qlk_coeffs,
        rt_rows=circuit.rt_rows(),
        srs_len=None if c == 1 else N,
    )


def _absorb_scalar(sponge: HostSponge, curve: CurveSpec, s: int) -> None:
    lo, hi = ipa._split_scalar(curve, s)
    sponge.absorb(lo)
    sponge.absorb(hi)


def _absorb_point(sponge: HostSponge, pt) -> None:
    # identity is absorbed as (0, 0) — not a curve point, so unambiguous
    sponge.absorb(pt[0] if pt else 0)
    sponge.absorb(pt[1] if pt else 0)


def opened_polys(index: VerifierIndexHost, w_coeffs, z_coeffs, lookup_coeffs):
    """Coefficient vectors in OPEN_ORDER (sigma[6] and t live in ft).
    lookup_coeffs = (s_coeffs[NSORTED], zl_c, t_joint_c, rt_c)."""
    s_c, zl_c, tj_c, rt_c = lookup_coeffs
    return (
        list(w_coeffs)
        + [z_coeffs]
        + list(index.sigma_coeffs[: PERMUTS - 1])
        + list(index.coeff_coeffs)
        + [index.sel_coeffs[g] for g in G.GATE_ORDER]
        + list(s_c)
        + [zl_c, tj_c, index.qlk_coeffs, rt_c, index.table_coeffs[4]]
    )


def opened_comms(index: VerifierIndexHost, w_comm, z_comm, lookup_comms):
    """lookup_comms = (s_comm[NSORTED], zl, t_joint, rt)."""
    s_cm, zl, tj, rt = lookup_comms
    return (
        list(w_comm)
        + [z_comm]
        + list(index.sigma_comm[: PERMUTS - 1])
        + list(index.coeff_comm)
        + [index.sel_comm[g] for g in G.GATE_ORDER]
        + list(s_cm)
        + [zl, tj, index.qlk_comm, rt, index.table_comm[4]]
    )


def _absorb_prev_sg(sponge, prev_challenges) -> None:
    """FQ sponge: absorb carried accumulator commitments right after the
    index digest (kimchi's oracles() absorbs RecursionChallenge comms);
    the challenge scalars are bound in the FR sponge (PARITY D7)."""
    for _chals, sg in prev_challenges:
        _absorb_point(sponge, sg)


def linearization_ft(
    index: VerifierIndexHost,
    t_chunks,
    t_blinds,
    evals,
    beta: int,
    gamma: int,
    alpha_pows,
    zeta: int,
):
    """The prover-side ft polynomial (PARITY D5), chunk-aware:
    ft = perm_ft * (sum_j zeta^(N j) sigma6_j) - Z_H(zeta) * sum_i zeta^(N i) t_i,
    perm_ft = -alpha^PERM zkpm(zeta) beta z(zeta w) D5,
    D5 = prod_{j<6} (w_j(z) + beta sigma_j(z) + gamma),
    with N the SRS chunk size (N = n when unchunked, so the sums
    collapse to sigma6 and the zeta^(n i) t-fold). The sigma6 sum is the
    zeta-COLLAPSE of its chunked commitment: collapsing at zeta is sound
    because zeta is fixed before ft is formed, and ft(zeta) still equals
    perm_ft*sigma6(zeta) - Z_H(zeta)*t(zeta) as the identity needs;
    ft_eval1 is the collapsed polynomial's value at zeta*omega.
    evals are the COMBINED (full-polynomial) openings at (zeta, zeta*w).
    Returns (ft_coeffs (length N), ft_blind, perm_ft, t_scales)."""
    ps = index.curve.scalar.p
    dom = index.domain
    n = dom.n
    N, c = index.chunk_size, index.chunks
    w_z = [evals[i][0] for i in range(COLUMNS)]
    z_zw = evals[COLUMNS][1]
    sig_z = [evals[COLUMNS + 1 + j][0] for j in range(PERMUTS - 1)]
    d5 = 1
    for j in range(PERMUTS - 1):
        d5 = d5 * (w_z[j] + beta * sig_z[j] + gamma) % ps
    zkpm_z = 1
    for j in range(1, ZK_ROWS + 1):
        zkpm_z = zkpm_z * (zeta - pow(dom.omega, n - j, ps)) % ps
    perm_ft = (-alpha_pows[ALPHA_PERM] * zkpm_z * beta * z_zw * d5) % ps
    zh = (pow(zeta, n, ps) - 1) % ps
    zN = pow(zeta, N, ps)
    t_scales = []
    zp = 1
    for _ in range(len(t_chunks)):
        t_scales.append((-zh * zp) % ps)
        zp = zp * zN % ps
    sigma6_chunks = poly_chunks(index.sigma_coeffs[PERMUTS - 1], N, c)
    sigma6_scales = [perm_ft * pow(zN, j, ps) % ps for j in range(c)]
    ft_coeffs = [0] * N
    for d in range(N):
        acc = 0
        for j in range(c):
            acc += sigma6_scales[j] * sigma6_chunks[j][d]
        for i, tc in enumerate(t_chunks):
            if d < len(tc):
                acc += t_scales[i] * tc[d]
        ft_coeffs[d] = acc % ps
    ft_blind = sum(
        t_scales[i] * t_blinds[i] for i in range(len(t_chunks))
    ) % ps
    return ft_coeffs, ft_blind, perm_ft, t_scales


def _inv_batch(p: int, vals: list[int]) -> list[int]:
    """Batched modular inversion (native Montgomery-trick when available);
    zeros map to zero, matching pow(0, p-2, p)."""
    from .. import native

    out = native.field_inv_batch(p, vals)
    if out is not None:
        return out
    return [pow(v, p - 2, p) for v in vals]


def _quotient_coeffs_py(
    index,
    circuit,
    w_coeffs,
    z_coeffs,
    s_coeffs,
    zl_coeffs,
    tj_coeffs,
    rt_coeffs,
    pub_coeffs,
    beta,
    gamma,
    alpha_pows,
    j_pows,
    gpb,
    one_pb4,
) -> list[int]:
    """Per-row Python quotient evaluation — the bit-exactness oracle for
    kimchi/prover_vec.quotient_coeffs (same math, big ints)."""
    dom = circuit.domain
    ps = dom.field.p
    n = dom.n
    ks = index.shifts
    gctx = gate_ctx(dom.field)
    ops = G.host_ops(ps)
    dom8 = Domain(dom.field, dom.log_size + 3)
    shift = 3
    assert pow(shift, dom8.n, ps) != 1

    def ext(coeffs):
        return coset_fft(dom8, coeffs, shift)

    w_ext = [ext(c) for c in w_coeffs]
    # next-row access: w(omega * X) has coefficients c_i * omega^i
    w_next_ext = [
        ext([c * pow(dom.omega, i, ps) % ps for i, c in enumerate(cs)])
        for cs in w_coeffs
    ]
    sig_ext = [ext(c) for c in index.sigma_coeffs]
    coeff_ext = [ext(c) for c in index.coeff_coeffs]
    sel_ext = {k: ext(c) for k, c in index.sel_coeffs.items()}
    z_ext = ext(z_coeffs)
    zw_ext = ext([c * pow(dom.omega, i, ps) % ps for i, c in enumerate(z_coeffs)])

    def ext_shift(coeffs):
        return ext([c * pow(dom.omega, i, ps) % ps for i, c in enumerate(coeffs)])

    s_ext = [ext(c) for c in s_coeffs]
    sw_ext = [ext_shift(c) for c in s_coeffs]
    zl_ext, zlw_ext = ext(zl_coeffs), ext_shift(zl_coeffs)
    tj_ext, tjw_ext = ext(tj_coeffs), ext_shift(tj_coeffs)
    qlk_ext = ext(index.qlk_coeffs)
    rt_ext = ext(rt_coeffs)
    rtsel_ext = ext(index.table_coeffs[4])
    lnm1_ext = ext(ifft(dom, [0] * (n - 1) + [1]))
    lzk_ext = ext(
        ifft(dom, [int(i == n - ZK_ROWS) for i in range(n)])
    )  # L_{n-ZK_ROWS}
    omega_last = pow(dom.omega, n - 1, ps)
    omega_zk = [pow(dom.omega, n - j, ps) for j in range(1, ZK_ROWS + 1)]
    pub_ext = ext(pub_coeffs)
    l0_ext = ext(ifft(dom, [1] + [0] * (n - 1)))

    n8 = dom8.n
    xs = [1] * n8
    for i in range(1, n8):
        xs[i] = xs[i - 1] * dom8.omega % ps

    t_evals = []
    for i in range(n8):
        xi = shift * xs[i] % ps
        row = G.RowView(
            w=[w_ext[c][i] for c in range(COLUMNS)],
            w_next=[w_next_ext[c][i] for c in range(COLUMNS)],
            c=[coeff_ext[c][i] for c in range(COEFFS)],
        )
        selectors = {g_: sel_ext[g_][i] for g_ in G.GATE_ORDER}
        gate = G.all_gate_constraints(
            ops, row, selectors, pub_ext[i], gctx, alpha_pows
        )
        num = den = 1
        for j in range(PERMUTS):
            num = num * (w_ext[j][i] + beta * ks[j] * xi + gamma) % ps
            den = den * (w_ext[j][i] + beta * sig_ext[j][i] + gamma) % ps
        zkpm_i = 1
        for wz in omega_zk:
            zkpm_i = zkpm_i * (xi - wz) % ps
        p2 = (z_ext[i] * num - zw_ext[i] * den) * zkpm_i % ps
        p1 = l0_ext[i] * (z_ext[i] - 1) % ps
        p3 = lzk_ext[i] * (z_ext[i] - 1) % ps
        # lookup constraints (kimchi shape)
        F_i = G.lookup_f_product(ops, row, selectors, qlk_ext[i], j_pows, gamma)
        A = 1
        for q in range(NSORTED):
            A = A * (gpb + s_ext[q][i] + beta * sw_ext[q][i]) % ps
        Bv = one_pb4 * F_i % ps * (gpb + tj_ext[i] + beta * tjw_ext[i]) % ps
        lk_rec = (xi - omega_last) * (zlw_ext[i] * A - zl_ext[i] * Bv) % ps
        lk_0 = l0_ext[i] * (zl_ext[i] - 1) % ps
        lk_last = lnm1_ext[i] * (zl_ext[i] - 1) % ps
        combined = (
            gate
            + alpha_pows[ALPHA_PERM] * p2
            + alpha_pows[ALPHA_PERM + 1] * p1
            + alpha_pows[ALPHA_PERM + 2] * p3
            + alpha_pows[ALPHA_LOOKUP] * lk_rec
            + alpha_pows[ALPHA_LOOKUP + 1] * lk_0
            + alpha_pows[ALPHA_LOOKUP + 2] * lk_last
        )
        for q in range(NSORTED - 1):
            combined += alpha_pows[ALPHA_LOOKUP + 3 + q] * (
                lnm1_ext[i] * (s_ext[q][i] - sw_ext[q + 1][i]) % ps
            )
        combined += alpha_pows[ALPHA_LOOKUP + 3 + NSORTED - 1] * (
            (1 - rtsel_ext[i]) * rt_ext[i] % ps
        )
        combined %= ps
        zh = (pow(xi, n, ps) - 1) % ps
        t_evals.append(combined * pow(zh, ps - 2, ps) % ps)
    return coset_ifft(dom8, t_evals, shift)


def prove(
    index: VerifierIndexHost,
    circuit: Circuit,
    witness: list[list[int]],
    public: list[int],
    g: list,
    h,
    rng,
    prev_challenges=(),
    runtime_table=None,
) -> HostProof:
    curve = index.curve
    dom = circuit.domain
    ps = curve.scalar.p
    n = dom.n
    N, nc = index.chunk_size, index.chunks  # SRS chunk size / chunk count
    g = g[:N]
    assert len(g) == N, "SRS smaller than the index's chunk size"
    circuit.check_witness(witness, public)
    ks = index.shifts
    gctx = gate_ctx(dom.field)
    ops = G.host_ops(ps)

    # 0. zero-knowledge rows: the last ZK_ROWS rows of every witness
    # column are replaced with random values (kimchi zk rows); gates,
    # wiring and lookups never touch them (circuit.build guarantees it)
    witness = [col[:] for col in witness]
    for c in range(COLUMNS):
        for r in range(n - ZK_ROWS, n):
            witness[c][r] = rng.randrange(ps)

    # 1. witness commitments (chunked when n > N; one blind per chunk)
    w_coeffs = [ifft(dom, col) for col in witness]
    w_blinds = [
        [rng.randrange(ps) for _ in range(nc)] for _ in range(COLUMNS)
    ]
    w_comm = [
        commit_chunks(curve, g, h, co, bl, N, nc)
        for co, bl in zip(w_coeffs, w_blinds)
    ]

    # public commitment, absorbed as a point like kimchi does (PARITY
    # D10): the transcript binds sum_i p_i L_i + 1*H (kimchi's public
    # commitment with its fixed blinder 1); the opening row itself stays
    # unblinded — the +H offset only enters the transcript.
    from ..curves import host as hc

    pub_coeffs = ifft(
        dom, [public[i] if i < len(public) else 0 for i in range(n)]
    )
    pub_comm = commit_chunks(curve, g, h, pub_coeffs, 0, N, nc)
    pub_comm_chunks = as_chunks(pub_comm)

    sponge = HostSponge(poseidon_spec(ipa.sponge_for(curve)))
    sponge.absorb(index.digest())
    _absorb_prev_sg(sponge, prev_challenges)
    # kimchi's blinder-1 offset rides on the FIRST chunk only (PARITY D10)
    _absorb_point(sponge, hc.add(curve, pub_comm_chunks[0], h))
    for pt in pub_comm_chunks[1:]:
        _absorb_point(sponge, pt)
    for pc in w_comm:
        for pt in as_chunks(pc):
            _absorb_point(sponge, pt)

    # 1b. lookup (kimchi shape): runtime-table commitment, joint
    # combiner, joint table values, per-row query values, sorted
    # multiset columns s_0..s_{NSORTED-1}
    qlk = circuit.q_lookup_evals()
    if runtime_table is None:
        runtime_table = [0] * circuit.rt_size
    assert len(runtime_table) == circuit.rt_size
    rt_evals = [0] * n
    for k, i in enumerate(circuit.rt_rows()):
        rt_evals[i] = runtime_table[k] % ps
    rt_coeffs = ifft(dom, rt_evals)
    rt_blind = [rng.randrange(ps) for _ in range(nc)]
    rt_comm = commit_chunks(curve, g, h, rt_coeffs, rt_blind, N, nc)
    for pt in as_chunks(rt_comm):
        _absorb_point(sponge, pt)
    joint = ipa.host_endo_chal(curve, sponge)
    j_pows = [pow(joint, k, ps) for k in range(G.JOINT_WIDTH + 1)]

    # joint-combined table values: col0 + j*(col1 + rt) + j^2*col2 + j^3*id
    tcols = circuit.table_column_evals()  # col0, col1, col2, ids, rt_sel
    t_vals = [
        (
            tcols[0][i]
            + j_pows[1] * (tcols[1][i] + rt_evals[i])
            + j_pows[2] * tcols[2][i]
            + j_pows[3] * tcols[3][i]
        )
        % ps
        for i in range(n)
    ]
    # per-row query values f_q (0 = dummy for inactive slots)
    hops = G.host_ops(ps)
    f_rows = []
    for i in range(n - 1):
        row = G.RowView(
            w=[witness[c][i] for c in range(COLUMNS)],
            w_next=[witness[c][(i + 1) % n] for c in range(COLUMNS)],
            c=[circuit.coeffs[c][i] for c in range(COEFFS)],
        )
        sels = {g_: circuit.sel[g_][i] for g_ in G.GATE_ORDER}
        f_rows.append(G.lookup_queries(hops, row, sels, qlk[i], j_pows))
    # sorted multiset: walk t in committed order, inserting each query
    # value directly after a table row holding it (plookup "sorted by t")
    first_row: dict = {}
    for i, tv in enumerate(t_vals):
        first_row.setdefault(tv, i)
    per_row_fs: list[list[int]] = [[] for _ in range(n)]
    for fs_ in f_rows:
        for f in fs_:
            assert f in first_row, f"lookup value {f} not in joint table"
            per_row_fs[first_row[f]].append(f)
    s_seq: list[int] = []
    for i in range(n):
        s_seq.append(t_vals[i])
        s_seq.extend(per_row_fs[i])
    assert len(s_seq) == NSORTED * n - (NSORTED - 1)
    s_vals = [s_seq[q * (n - 1) : q * (n - 1) + n] for q in range(NSORTED)]
    s_coeffs = [ifft(dom, v) for v in s_vals]
    s_blinds = [
        [rng.randrange(ps) for _ in range(nc)] for _ in range(NSORTED)
    ]
    s_comm = [
        commit_chunks(curve, g, h, co, bl, N, nc)
        for co, bl in zip(s_coeffs, s_blinds)
    ]
    for pc in s_comm:
        for pt in as_chunks(pc):
            _absorb_point(sponge, pt)

    beta = ipa.host_squeeze_128(sponge)
    gamma = ipa.host_squeeze_128(sponge)

    # 2. permutation accumulator z over rows 0..n-ZK_ROWS-1; the zk rows
    # carry random z values, and the closing condition is z[n-ZK_ROWS]=1
    # (the recurrence constraint is multiplied by zkpm, which vanishes on
    # the zk rows, so those entries are unconstrained)
    sig_evals = [fft(dom, c) for c in index.sigma_coeffs]
    pow_omega = [1] * n
    for i in range(1, n):
        pow_omega[i] = pow_omega[i - 1] * dom.omega % ps
    z_nums, z_dens = [], []
    for i in range(n - ZK_ROWS):
        num = den = 1
        for j in range(PERMUTS):
            num = num * (witness[j][i] + beta * ks[j] * pow_omega[i] + gamma) % ps
            den = den * (witness[j][i] + beta * sig_evals[j][i] + gamma) % ps
        z_nums.append(num)
        z_dens.append(den)
    z_dinv = _inv_batch(ps, z_dens)
    z = [1]
    for i in range(n - ZK_ROWS):
        z.append(z[-1] * z_nums[i] % ps * z_dinv[i] % ps)
    assert z[n - ZK_ROWS] == 1, "permutation argument does not close"
    z = z[: n - ZK_ROWS + 1] + [
        rng.randrange(ps) for _ in range(ZK_ROWS - 1)
    ]
    assert len(z) == n

    z_coeffs = ifft(dom, z)
    z_blind = [rng.randrange(ps) for _ in range(nc)]
    z_comm = commit_chunks(curve, g, h, z_coeffs, z_blind, N, nc)

    # 2b. lookup aggregation Z_L (plookup recurrence over rows 0..n-2,
    # kimchi shape: LOOKUPS_PER_ROW query factors, NSORTED sorted factors)
    gpb = gamma * (1 + beta) % ps
    one_pb4 = pow(1 + beta, G.LOOKUPS_PER_ROW, ps)
    zl_nums, zl_dens = [], []
    for i in range(n - 1):
        num = one_pb4 * (gpb + t_vals[i] + beta * t_vals[i + 1]) % ps
        for f in f_rows[i]:
            num = num * (gamma + f) % ps
        den = 1
        for q in range(NSORTED):
            den = den * (gpb + s_vals[q][i] + beta * s_vals[q][i + 1]) % ps
        zl_nums.append(num)
        zl_dens.append(den)
    zl_dinv = _inv_batch(ps, zl_dens)
    zl = [1]
    for i in range(n - 1):
        zl.append(zl[-1] * zl_nums[i] % ps * zl_dinv[i] % ps)
    assert zl[-1] == 1, "plookup aggregation does not close"
    zl_coeffs = ifft(dom, zl)
    zl_blind = [rng.randrange(ps) for _ in range(nc)]
    zl_comm = commit_chunks(curve, g, h, zl_coeffs, zl_blind, N, nc)

    for pt in as_chunks(z_comm):
        _absorb_point(sponge, pt)
    for pt in as_chunks(zl_comm):
        _absorb_point(sponge, pt)
    alpha = ipa.host_endo_chal(curve, sponge)
    alpha_pows = [pow(alpha, k, ps) for k in range(N_ALPHAS)]

    # 3. quotient t on a coset of the 8n domain. Native vectorized path
    # (kimchi/prover_vec.py) when available; the per-row Python loop
    # (_quotient_coeffs_py) is the bit-exactness oracle.
    # joint table polynomial (coefficient-space j-combination)
    tj_coeffs = [
        (
            index.table_coeffs[0][d]
            + j_pows[1] * (index.table_coeffs[1][d] + rt_coeffs[d])
            + j_pows[2] * index.table_coeffs[2][d]
            + j_pows[3] * index.table_coeffs[3][d]
        )
        % ps
        for d in range(n)
    ]
    qargs = (
        index, circuit, w_coeffs, z_coeffs, s_coeffs, zl_coeffs, tj_coeffs,
        rt_coeffs, pub_coeffs, beta, gamma, alpha_pows, j_pows, gpb, one_pb4,
    )
    from .. import native

    if native.vec_available():
        from .prover_vec import quotient_coeffs

        t_coeffs = quotient_coeffs(*qargs)
    else:
        t_coeffs = _quotient_coeffs_py(*qargs)
    assert all(co == 0 for co in t_coeffs[T_CHUNKS * n :]), "t degree overflow"
    TC = T_CHUNKS * nc  # t chunks are SRS-sized: 7 n-sized = 7*nc N-sized
    t_chunks = [t_coeffs[i * N : (i + 1) * N] for i in range(TC)]
    t_blinds = [rng.randrange(ps) for _ in range(TC)]
    t_comm = [
        ipa.host_commit(curve, g, h, co, b) for co, b in zip(t_chunks, t_blinds)
    ]
    for pt in t_comm:
        _absorb_point(sponge, pt)
    zeta = ipa.host_endo_chal(curve, sponge)
    zeta_w = zeta * dom.omega % ps
    fq_digest = sponge.squeeze()

    # 4. evaluations in OPEN_ORDER (sigma6 / t chunks fold into ft).
    # The joint-table row: poly/blind/comm are the j-combination of the
    # index's column polys + the runtime poly (homomorphic, per chunk).
    tj_blind = [j_pows[1] * rb % ps for rb in rt_blind]
    tj_ch = []
    for j in range(nc):
        pt = as_chunks(index.table_comm[0])[j]
        pt = hc.add(
            curve,
            pt,
            hc.mul(
                curve,
                j_pows[1],
                hc.add(
                    curve,
                    as_chunks(index.table_comm[1])[j],
                    as_chunks(rt_comm)[j],
                ),
            ),
        )
        pt = hc.add(
            curve, pt, hc.mul(curve, j_pows[2], as_chunks(index.table_comm[2])[j])
        )
        pt = hc.add(
            curve, pt, hc.mul(curve, j_pows[3], as_chunks(index.table_comm[3])[j])
        )
        tj_ch.append(pt)
    tj_comm = tj_ch[0] if nc == 1 else tj_ch
    polys = opened_polys(
        index, w_coeffs, z_coeffs, (s_coeffs, zl_coeffs, tj_coeffs, rt_coeffs)
    )
    zero_bl = [0] * nc
    blind_lists = (
        w_blinds
        + [z_blind]
        + [zero_bl] * (PERMUTS - 1 + COEFFS + len(G.GATE_ORDER))
        + s_blinds
        + [zl_blind, tj_blind, zero_bl, rt_blind, zero_bl]
    )
    blinds = [b for bl in blind_lists for b in bl]
    comms = opened_comms(index, w_comm, z_comm, (s_comm, zl_comm, tj_comm, rt_comm))
    # per-chunk openings at (zeta, zeta*w), flattened [poly][chunk] —
    # the proof's wire format; the identity consumes the COMBINED evals
    poly_ch = [poly_chunks(co, N, nc) for co in polys]
    evals = [
        [poly_eval(ch, zeta, ps), poly_eval(ch, zeta_w, ps)]
        for chs in poly_ch
        for ch in chs
    ]
    evals_comb = combine_chunk_evals(evals, nc, zeta, zeta_w, N, ps)

    # linearization polynomial ft + its second evaluation point
    ft_coeffs, ft_blind, _, _ = linearization_ft(
        index, t_chunks, t_blinds, evals_comb, beta, gamma, alpha_pows, zeta
    )
    ft_eval1 = poly_eval(ft_coeffs, zeta_w, ps)
    pub_chunk_coeffs = poly_chunks(pub_coeffs, N, nc)
    pub_evals = [
        (poly_eval(ch, zeta, ps), poly_eval(ch, zeta_w, ps))
        for ch in pub_chunk_coeffs
    ]

    # FR sponge: evaluations bind in the scalar field (PARITY D3)
    frs = HostSponge(poseidon_spec(curve.scalar.name))
    frs.absorb(fq_digest % ps)
    for chals, _sg in prev_challenges:
        for ch in chals:
            frs.absorb(ch)
    for ez, ew in pub_evals:
        frs.absorb(ez)
        frs.absorb(ew)
    frs.absorb(ft_eval1)
    for e0, e1 in evals:
        frs.absorb(e0)
        frs.absorb(e1)
    v = ipa.host_endo_chal(curve, frs)
    u = ipa.host_endo_chal(curve, frs)

    # v-combine row order: carried accumulators (b_poly rows against sg),
    # then [public chunks, ft], then the prover-opened chunk rows. The
    # IPA opening continues the FQ sponge; every opened vector has
    # length <= N, so the IPA runs over the SRS regardless of domain.
    prev_polys = [ipa.host_s_vector(chals, ps) for chals, _ in prev_challenges]
    prev_comms = [sg for _, sg in prev_challenges]
    ft_comm = ipa.host_commit(curve, g, h, ft_coeffs, ft_blind)
    flat_polys = [ch for chs in poly_ch for ch in chs]
    flat_comms = [pt for cm in comms for pt in as_chunks(cm)]
    prover = ipa.HostIpaProver(curve, g, h, rng)
    opening, _ = prover.open(
        prev_polys + pub_chunk_coeffs + [ft_coeffs] + flat_polys,
        [0] * len(prev_polys) + [0] * nc + [ft_blind] + blinds,
        prev_comms + pub_comm_chunks + [ft_comm] + flat_comms,
        [zeta, zeta_w],
        sponge=sponge,
        v=v,
        u=u,
    )
    return HostProof(
        prev_challenges=[(list(c), sg) for c, sg in prev_challenges],
        w_comm=w_comm,
        z_comm=z_comm,
        s_comm=s_comm,
        rt_comm=rt_comm,
        zl_comm=zl_comm,
        t_comm=t_comm,
        evals=evals,
        ft_eval1=ft_eval1,
        opening=opening,
        public=list(public),
    )


def host_verify(index: VerifierIndexHost, proof: HostProof, g: list, h) -> bool:
    """Host oracle for the device verifier (same math, big ints)."""
    curve = index.curve
    dom = index.domain
    ps = curve.scalar.p
    n = dom.n
    N, nc = index.chunk_size, index.chunks
    g = g[:N]
    ks = index.shifts
    ops = G.host_ops(ps)
    gctx = gate_ctx(dom.field)

    # public commitment via the Lagrange-basis commitments (PARITY D10):
    # the verifier recomputes sum_i p_i L_i (per chunk) and absorbs the
    # first chunk +H, exactly mirroring the prover's transcript.
    from ..curves import host as hc

    pub_comm_chunks = [None] * nc
    for i, p_i in enumerate(proof.public):
        unit = [0] * n
        unit[i] = 1
        li = as_chunks(commit_chunks(curve, g, h, ifft(dom, unit), 0, N, nc))
        for j in range(nc):
            pub_comm_chunks[j] = hc.add(
                curve, pub_comm_chunks[j], hc.mul(curve, p_i, li[j])
            )

    sponge = HostSponge(poseidon_spec(ipa.sponge_for(curve)))
    sponge.absorb(index.digest())
    _absorb_prev_sg(sponge, proof.prev_challenges)
    _absorb_point(sponge, hc.add(curve, pub_comm_chunks[0], h))
    for pt in pub_comm_chunks[1:]:
        _absorb_point(sponge, pt)
    for pc in proof.w_comm:
        for pt in as_chunks(pc):
            _absorb_point(sponge, pt)
    for pt in as_chunks(proof.rt_comm):
        _absorb_point(sponge, pt)
    joint = ipa.host_endo_chal(curve, sponge)
    j_pows = [pow(joint, k, ps) for k in range(G.JOINT_WIDTH + 1)]
    for pc in proof.s_comm:
        for pt in as_chunks(pc):
            _absorb_point(sponge, pt)
    beta = ipa.host_squeeze_128(sponge)
    gamma = ipa.host_squeeze_128(sponge)
    for pt in as_chunks(proof.z_comm):
        _absorb_point(sponge, pt)
    for pt in as_chunks(proof.zl_comm):
        _absorb_point(sponge, pt)
    alpha = ipa.host_endo_chal(curve, sponge)
    alpha_pows = [pow(alpha, k, ps) for k in range(N_ALPHAS)]
    for pt in proof.t_comm:
        _absorb_point(sponge, pt)
    zeta = ipa.host_endo_chal(curve, sponge)
    zeta_w = zeta * dom.omega % ps
    fq_digest = sponge.squeeze()

    # per-chunk public openings (closed-form chunk Lagrange evals) + the
    # combined (full-polynomial) values for the scalar identity
    pub_evals = []
    for j in range(nc):
        ez = (
            sum(
                proof.public[i] * lagrange_chunk_eval(dom, i, j, N, zeta)
                for i in range(len(proof.public))
            )
            % ps
        )
        ew = (
            sum(
                proof.public[i] * lagrange_chunk_eval(dom, i, j, N, zeta_w)
                for i in range(len(proof.public))
            )
            % ps
        )
        pub_evals.append((ez, ew))
    (pub_eval_z, pub_eval_w) = combine_chunk_evals(
        pub_evals, nc, zeta, zeta_w, N, ps
    )[0]

    frs = HostSponge(poseidon_spec(curve.scalar.name))
    frs.absorb(fq_digest % ps)
    for chals, _sg in proof.prev_challenges:
        for ch in chals:
            frs.absorb(ch)
    for ez, ew in pub_evals:
        frs.absorb(ez)
        frs.absorb(ew)
    frs.absorb(proof.ft_eval1)
    for e0, e1 in proof.evals:
        frs.absorb(e0)
        frs.absorb(e1)
    v = ipa.host_endo_chal(curve, frs)
    u = ipa.host_endo_chal(curve, frs)

    ev = combine_chunk_evals(proof.evals, nc, zeta, zeta_w, N, ps)
    off = 0
    w_z = [ev[off + i][0] for i in range(COLUMNS)]
    w_zw = [ev[off + i][1] for i in range(COLUMNS)]
    off += COLUMNS
    z_z, z_zw = ev[off]
    off += 1
    sig_z = [ev[off + j][0] for j in range(PERMUTS - 1)]
    off += PERMUTS - 1
    coeff_z = [ev[off + j][0] for j in range(COEFFS)]
    off += COEFFS
    sel_z = {g_: ev[off + i][0] for i, g_ in enumerate(G.GATE_ORDER)}
    off += len(G.GATE_ORDER)
    s_z = [ev[off + q][0] for q in range(NSORTED)]
    s_zw = [ev[off + q][1] for q in range(NSORTED)]
    off += NSORTED
    zl_z, zl_zw = ev[off]
    tj_z, tj_zw = ev[off + 1]
    qlk_z = ev[off + 2][0]
    rt_z = ev[off + 3][0]
    rtsel_z = ev[off + 4][0]

    zh = dom.vanishing_eval(zeta)
    row = G.RowView(w=w_z, w_next=w_zw, c=coeff_z)
    gate = G.all_gate_constraints(ops, row, sel_z, pub_eval_z, gctx, alpha_pows)
    num = 1
    d5 = 1
    for j in range(PERMUTS):
        num = num * (w_z[j] + beta * ks[j] * zeta + gamma) % ps
    for j in range(PERMUTS - 1):
        d5 = d5 * (w_z[j] + beta * sig_z[j] + gamma) % ps
    zkpm_z = 1
    for j in range(1, ZK_ROWS + 1):
        zkpm_z = zkpm_z * (zeta - pow(dom.omega, n - j, ps)) % ps
    # sigma6 term lives in ft: scalar part uses D5 * (w6 + gamma)
    p2 = (z_z * num - z_zw * d5 * (w_z[PERMUTS - 1] + gamma)) * zkpm_z % ps
    perm_ft = (-alpha_pows[ALPHA_PERM] * zkpm_z * beta * z_zw * d5) % ps
    l0 = dom.lagrange_eval(0, zeta)
    p1 = l0 * (z_z - 1) % ps
    p3 = dom.lagrange_eval(n - ZK_ROWS, zeta) * (z_z - 1) % ps
    # lookup constraints at zeta (kimchi shape)
    gpb = gamma * (1 + beta) % ps
    one_pb4 = pow(1 + beta, G.LOOKUPS_PER_ROW, ps)
    F_z = G.lookup_f_product(ops, row, sel_z, qlk_z, j_pows, gamma)
    A = 1
    for q in range(NSORTED):
        A = A * (gpb + s_z[q] + beta * s_zw[q]) % ps
    Bv = one_pb4 * F_z % ps * (gpb + tj_z + beta * tj_zw) % ps
    omega_last = pow(dom.omega, n - 1, ps)
    lnm1 = dom.lagrange_eval(n - 1, zeta)
    lk_rec = (zeta - omega_last) * (zl_zw * A - zl_z * Bv) % ps
    lk_0 = l0 * (zl_z - 1) % ps
    lk_last = lnm1 * (zl_z - 1) % ps

    # S = all-scalar part; ft(zeta) must equal -S (checked by the opening)
    S = (
        gate
        + alpha_pows[ALPHA_PERM] * p2
        + alpha_pows[ALPHA_PERM + 1] * p1
        + alpha_pows[ALPHA_PERM + 2] * p3
        + alpha_pows[ALPHA_LOOKUP] * lk_rec
        + alpha_pows[ALPHA_LOOKUP + 1] * lk_0
        + alpha_pows[ALPHA_LOOKUP + 2] * lk_last
    )
    for q in range(NSORTED - 1):
        S += alpha_pows[ALPHA_LOOKUP + 3 + q] * (
            lnm1 * (s_z[q] - s_zw[q + 1]) % ps
        )
    S += alpha_pows[ALPHA_LOOKUP + 3 + NSORTED - 1] * (
        (1 - rtsel_z) * rt_z % ps
    )
    ft_eval0 = (-S) % ps

    # verifier-side commitments: public = sum p_i L_i (Lagrange comms);
    # ft = perm_ft * (sum_j zeta^(N j) sigma6_j) - zh * sum zeta^(N i) t_i
    # — the zeta-collapse of the chunked sigma6/t commitments (degree <
    # N, a single opened row; see linearization_ft). The pub_comm chunks
    # computed above for the transcript are reused as the public opening
    # rows' commitments.
    zN = pow(zeta, N, ps)
    ft_comm = None
    zp = perm_ft
    for s6 in as_chunks(index.sigma_comm[PERMUTS - 1]):
        ft_comm = hc.add(index.curve, ft_comm, hc.mul(index.curve, zp, s6))
        zp = zp * zN % ps
    zp = 1
    for i in range(T_CHUNKS * nc):
        ft_comm = hc.add(
            index.curve,
            ft_comm,
            hc.mul(index.curve, (-zh * zp) % ps, proof.t_comm[i]),
        )
        zp = zp * zN % ps

    tj_ch = []
    for j in range(nc):
        pt = as_chunks(index.table_comm[0])[j]
        pt = hc.add(
            curve,
            pt,
            hc.mul(
                curve,
                j_pows[1],
                hc.add(
                    curve,
                    as_chunks(index.table_comm[1])[j],
                    as_chunks(proof.rt_comm)[j],
                ),
            ),
        )
        pt = hc.add(
            curve, pt, hc.mul(curve, j_pows[2], as_chunks(index.table_comm[2])[j])
        )
        pt = hc.add(
            curve, pt, hc.mul(curve, j_pows[3], as_chunks(index.table_comm[3])[j])
        )
        tj_ch.append(pt)
    tj_comm = tj_ch[0] if nc == 1 else tj_ch
    comms = opened_comms(
        index,
        proof.w_comm,
        proof.z_comm,
        (proof.s_comm, proof.zl_comm, tj_comm, proof.rt_comm),
    )
    flat_comms = [pt for cm in comms for pt in as_chunks(cm)]
    # verifier-computed rows for the carried accumulators: opening
    # b_poly(chals, .) against sg at a random zeta decides the deferred
    # claim sg == <s(chals), G> (Schwartz-Zippel over the binding comm)
    prev_comms = [sg for _, sg in proof.prev_challenges]
    prev_evals = [
        [
            ipa.host_b_poly(chals, zeta, ps),
            ipa.host_b_poly(chals, zeta_w, ps),
        ]
        for chals, _ in proof.prev_challenges
    ]
    return ipa.host_verify(
        index.curve,
        g,
        h,
        prev_comms + pub_comm_chunks + [ft_comm] + flat_comms,
        [zeta, zeta_w],
        prev_evals
        + [list(pe) for pe in pub_evals]
        + [[ft_eval0, proof.ft_eval1]]
        + proof.evals,
        proof.opening,
        sponge=sponge,
        v=v,
        u=u,
    )
