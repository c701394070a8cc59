"""Host (CPU, big-int) kimchi-style prover + verifier index construction.

Produces the proof fixtures that the TPU verifier (kimchi/verifier.py)
consumes — fulfilling SURVEY §4's mandate to build our own fixture corpus
(the reference ships zero test vectors). The transcript here is the
protocol ground truth; the device verifier reproduces it bit-exactly.

Gate constraints come from kimchi/gates.py (generic + poseidon +
complete_add, selector-weighted, alpha-combined), followed by the
7-column permutation argument; the quotient is computed on a coset of
the 8n domain and split into 7 chunks (kimchi's split size).

Transcript (single Poseidon sponge over the curve's base field):
    absorb index digest
    absorb public values (2 pieces each)
    absorb w_comm[15] (x, y each)
    squeeze beta, squeeze gamma            (128-bit)
    absorb z_comm; squeeze alpha
    absorb t_comm[7]; squeeze zeta
    absorb all evals in OPEN_ORDER at (zeta, zeta*omega) (2 pieces each)
    squeeze v (polyscale), squeeze u (evalscale)
    ... IPA opening continues the same sponge (commitment/ipa.py)
"""

from __future__ import annotations

import dataclasses

from ..commitment import ipa
from ..curves.host import CurveSpec
from ..hash.poseidon import HostSponge
from ..hash.poseidon_params import poseidon_spec
from . import gates as G
from .circuit import COEFFS, COLUMNS, PERMUTS, Circuit, shifts
from .domain import Domain, coset_fft, coset_ifft, fft, ifft, poly_eval

T_CHUNKS = 7
# opening order: w15, z, sigma7, coeffs15, sel(gen,pos,add), t7
N_OPENED = COLUMNS + 1 + PERMUTS + COEFFS + len(G.GATE_ORDER) + T_CHUNKS  # 48
ALPHA_PERM = G.N_GATE_CONSTRAINTS  # alpha powers: gates 0..22, perm 23, 24


@dataclasses.dataclass
class VerifierIndexHost:
    curve: CurveSpec
    domain: Domain
    npub: int
    sigma_comm: list  # 7 affine points
    coeff_comm: list  # 15 affine points
    sel_comm: dict  # gate name -> affine point
    shifts: tuple[int, ...]
    sigma_coeffs: list
    coeff_coeffs: list
    sel_coeffs: dict

    def digest(self) -> int:
        """Poseidon hash of all index commitments (binds the circuit)."""
        sponge = HostSponge(poseidon_spec(ipa.sponge_for(self.curve)))
        pts = (
            self.sigma_comm
            + self.coeff_comm
            + [self.sel_comm[g] for g in G.GATE_ORDER]
        )
        for pt in pts:
            sponge.absorb(pt[0] if pt else 0)
            sponge.absorb(pt[1] if pt else 0)
        sponge.absorb(self.domain.n)
        sponge.absorb(self.npub)
        return sponge.squeeze()


@dataclasses.dataclass
class HostProof:
    w_comm: list  # 15 affine
    z_comm: tuple
    t_comm: list  # 7 affine
    evals: list  # N_OPENED x 2 scalar ints, OPEN_ORDER
    opening: ipa.HostOpeningProof
    public: list[int]


def setup(circuit: Circuit, curve: CurveSpec, g: list, h) -> VerifierIndexHost:
    assert circuit.domain.field is curve.scalar
    assert len(g) >= circuit.n
    g = g[: circuit.n]
    sigma_coeffs = [ifft(circuit.domain, s) for s in circuit.sigma_evals()]
    coeff_coeffs = circuit.coeff_coeffs()
    sel_coeffs = circuit.sel_coeffs()
    return VerifierIndexHost(
        curve=curve,
        domain=circuit.domain,
        npub=circuit.npub,
        sigma_comm=[ipa.host_commit(curve, g, h, c, 0) for c in sigma_coeffs],
        coeff_comm=[ipa.host_commit(curve, g, h, c, 0) for c in coeff_coeffs],
        sel_comm={
            k: ipa.host_commit(curve, g, h, c, 0) for k, c in sel_coeffs.items()
        },
        shifts=shifts(circuit.domain.field, circuit.domain.log_size),
        sigma_coeffs=sigma_coeffs,
        coeff_coeffs=coeff_coeffs,
        sel_coeffs=sel_coeffs,
    )


def _absorb_scalar(sponge: HostSponge, curve: CurveSpec, s: int) -> None:
    lo, hi = ipa._split_scalar(curve, s)
    sponge.absorb(lo)
    sponge.absorb(hi)


def _absorb_point(sponge: HostSponge, pt) -> None:
    # identity is absorbed as (0, 0) — not a curve point, so unambiguous
    sponge.absorb(pt[0] if pt else 0)
    sponge.absorb(pt[1] if pt else 0)


def opened_polys(index: VerifierIndexHost, w_coeffs, z_coeffs, t_chunks):
    """Coefficient vectors in OPEN_ORDER."""
    return (
        list(w_coeffs)
        + [z_coeffs]
        + list(index.sigma_coeffs)
        + list(index.coeff_coeffs)
        + [index.sel_coeffs[g] for g in G.GATE_ORDER]
        + list(t_chunks)
    )


def opened_comms(index: VerifierIndexHost, w_comm, z_comm, t_comm):
    return (
        list(w_comm)
        + [z_comm]
        + list(index.sigma_comm)
        + list(index.coeff_comm)
        + [index.sel_comm[g] for g in G.GATE_ORDER]
        + list(t_comm)
    )


def prove(
    index: VerifierIndexHost,
    circuit: Circuit,
    witness: list[list[int]],
    public: list[int],
    g: list,
    h,
    rng,
) -> HostProof:
    curve = index.curve
    dom = circuit.domain
    ps = curve.scalar.p
    n = dom.n
    g = g[:n]
    circuit.check_witness(witness, public)
    ks = index.shifts
    pspec = poseidon_spec(dom.field.name)
    ops = G.host_ops(ps)

    # 1. witness commitments
    w_coeffs = [ifft(dom, col) for col in witness]
    w_blinds = [rng.randrange(ps) for _ in range(COLUMNS)]
    w_comm = [
        ipa.host_commit(curve, g, h, c, b) for c, b in zip(w_coeffs, w_blinds)
    ]

    sponge = HostSponge(poseidon_spec(ipa.sponge_for(curve)))
    sponge.absorb(index.digest())
    for x in public:
        _absorb_scalar(sponge, curve, x)
    for pt in w_comm:
        _absorb_point(sponge, pt)
    beta = ipa.host_squeeze_128(sponge)
    gamma = ipa.host_squeeze_128(sponge)

    # 2. permutation accumulator z
    sig_evals = [fft(dom, c) for c in index.sigma_coeffs]
    pow_omega = [1] * n
    for i in range(1, n):
        pow_omega[i] = pow_omega[i - 1] * dom.omega % ps
    z = [1]
    for i in range(n - 1):
        num = den = 1
        for j in range(PERMUTS):
            num = num * (witness[j][i] + beta * ks[j] * pow_omega[i] + gamma) % ps
            den = den * (witness[j][i] + beta * sig_evals[j][i] + gamma) % ps
        z.append(z[-1] * num * pow(den, ps - 2, ps) % ps)
    num = den = 1
    i = n - 1
    for j in range(PERMUTS):
        num = num * (witness[j][i] + beta * ks[j] * pow_omega[i] + gamma) % ps
        den = den * (witness[j][i] + beta * sig_evals[j][i] + gamma) % ps
    assert z[-1] * num % ps == den % ps, "permutation argument does not close"

    z_coeffs = ifft(dom, z)
    z_blind = rng.randrange(ps)
    z_comm = ipa.host_commit(curve, g, h, z_coeffs, z_blind)
    _absorb_point(sponge, z_comm)
    alpha = ipa.host_squeeze_128(sponge)
    alpha_pows = [pow(alpha, k, ps) for k in range(ALPHA_PERM + 2)]

    # 3. quotient t on a coset of the 8n domain
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
    pub_coeffs = ifft(
        dom, [public[i] if i < len(public) else 0 for i in range(n)]
    )
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
            ops, row, selectors, pub_ext[i], pspec, alpha_pows
        )
        num = den = 1
        for j in range(PERMUTS):
            num = num * (w_ext[j][i] + beta * ks[j] * xi + gamma) % ps
            den = den * (w_ext[j][i] + beta * sig_ext[j][i] + gamma) % ps
        p2 = (z_ext[i] * num - zw_ext[i] * den) % ps
        p1 = l0_ext[i] * (z_ext[i] - 1) % ps
        combined = (
            gate + alpha_pows[ALPHA_PERM] * p2 + alpha_pows[ALPHA_PERM + 1] * p1
        ) % ps
        zh = (pow(xi, n, ps) - 1) % ps
        t_evals.append(combined * pow(zh, ps - 2, ps) % ps)
    t_coeffs = coset_ifft(dom8, t_evals, shift)
    assert all(c == 0 for c in t_coeffs[T_CHUNKS * n :]), "t degree overflow"
    t_chunks = [t_coeffs[i * n : (i + 1) * n] for i in range(T_CHUNKS)]
    t_blinds = [rng.randrange(ps) for _ in range(T_CHUNKS)]
    t_comm = [
        ipa.host_commit(curve, g, h, c, b) for c, b in zip(t_chunks, t_blinds)
    ]
    for pt in t_comm:
        _absorb_point(sponge, pt)
    zeta = ipa.host_squeeze_128(sponge)
    zeta_w = zeta * dom.omega % ps

    # 4. evaluations in OPEN_ORDER
    polys = opened_polys(index, w_coeffs, z_coeffs, t_chunks)
    blinds = (
        w_blinds
        + [z_blind]
        + [0] * (PERMUTS + COEFFS + len(G.GATE_ORDER))
        + t_blinds
    )
    comms = opened_comms(index, w_comm, z_comm, t_comm)
    evals = [[poly_eval(c, zeta, ps), poly_eval(c, zeta_w, ps)] for c in polys]
    for e0, e1 in evals:
        _absorb_scalar(sponge, curve, e0)
        _absorb_scalar(sponge, curve, e1)
    v = ipa.host_squeeze_128(sponge)
    u = ipa.host_squeeze_128(sponge)

    prover = ipa.HostIpaProver(curve, g, h, rng)
    opening, _ = prover.open(
        polys, blinds, comms, [zeta, zeta_w], sponge=sponge, v=v, u=u
    )
    return HostProof(
        w_comm=w_comm,
        z_comm=z_comm,
        t_comm=t_comm,
        evals=evals,
        opening=opening,
        public=list(public),
    )


def host_verify(index: VerifierIndexHost, proof: HostProof, g: list, h) -> bool:
    """Host oracle for the device verifier (same math, big ints)."""
    curve = index.curve
    dom = index.domain
    ps = curve.scalar.p
    n = dom.n
    ks = index.shifts
    ops = G.host_ops(ps)
    pspec = poseidon_spec(dom.field.name)

    sponge = HostSponge(poseidon_spec(ipa.sponge_for(curve)))
    sponge.absorb(index.digest())
    for x in proof.public:
        _absorb_scalar(sponge, curve, x)
    for pt in proof.w_comm:
        _absorb_point(sponge, pt)
    beta = ipa.host_squeeze_128(sponge)
    gamma = ipa.host_squeeze_128(sponge)
    _absorb_point(sponge, proof.z_comm)
    alpha = ipa.host_squeeze_128(sponge)
    alpha_pows = [pow(alpha, k, ps) for k in range(ALPHA_PERM + 2)]
    for pt in proof.t_comm:
        _absorb_point(sponge, pt)
    zeta = ipa.host_squeeze_128(sponge)
    zeta_w = zeta * dom.omega % ps
    for e0, e1 in proof.evals:
        _absorb_scalar(sponge, curve, e0)
        _absorb_scalar(sponge, curve, e1)
    v = ipa.host_squeeze_128(sponge)
    u = ipa.host_squeeze_128(sponge)

    ev = proof.evals
    off = 0
    w_z = [ev[off + i][0] for i in range(COLUMNS)]
    w_zw = [ev[off + i][1] for i in range(COLUMNS)]
    off += COLUMNS
    z_z, z_zw = ev[off]
    off += 1
    sig_z = [ev[off + j][0] for j in range(PERMUTS)]
    off += PERMUTS
    coeff_z = [ev[off + j][0] for j in range(COEFFS)]
    off += COEFFS
    sel_z = {g_: ev[off + i][0] for i, g_ in enumerate(G.GATE_ORDER)}
    off += len(G.GATE_ORDER)
    t_z = [ev[off + i][0] for i in range(T_CHUNKS)]

    zh = dom.vanishing_eval(zeta)
    pub_eval = (
        sum(
            proof.public[i] * dom.lagrange_eval(i, zeta)
            for i in range(len(proof.public))
        )
        % ps
    )
    row = G.RowView(w=w_z, w_next=w_zw, c=coeff_z)
    gate = G.all_gate_constraints(ops, row, sel_z, pub_eval, pspec, alpha_pows)
    num = den = 1
    for j in range(PERMUTS):
        num = num * (w_z[j] + beta * ks[j] * zeta + gamma) % ps
        den = den * (w_z[j] + beta * sig_z[j] + gamma) % ps
    p2 = (z_z * num - z_zw * den) % ps
    l0 = dom.lagrange_eval(0, zeta)
    p1 = l0 * (z_z - 1) % ps
    t_at = 0
    zn = pow(zeta, n, ps)
    for i in reversed(range(T_CHUNKS)):
        t_at = (t_at * zn + t_z[i]) % ps
    lhs = (
        gate + alpha_pows[ALPHA_PERM] * p2 + alpha_pows[ALPHA_PERM + 1] * p1
    ) % ps
    if (lhs - zh * t_at) % ps != 0:
        return False

    comms = opened_comms(index, proof.w_comm, proof.z_comm, proof.t_comm)
    return ipa.host_verify(
        index.curve,
        g,
        h,
        comms,
        [zeta, zeta_w],
        proof.evals,
        proof.opening,
        sponge=sponge,
        v=v,
        u=u,
    )
