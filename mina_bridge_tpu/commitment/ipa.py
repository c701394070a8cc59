"""IPA (bulletproof-style) polynomial commitment: host prover + TPU verifier.

Mirrors the role of the reference's pinned `poly-commitment` crate
(core/Cargo.toml:16; SURVEY §2b): Pedersen vector commitments over the
SRS, log-round opening proofs with the Pickles accumulator `sg`
(= commitment to h(X) = prod_i (1 + u_{k-1-i} X^{2^i}), reference
README.md:534-544), and batched verification that reduces every opening
in a batch to ONE random-linear-combination MSM over
[H, J, g_0..g_{n-1}] + per-proof points — the TPU-shaped formulation of
kimchi's `batch_verify`.

Design notes (differences from the Rust stack, chosen for TPU):
* The per-proof blinding group element U = to_group(t) is kimchi's exact
  SvdW group map of the transcript challenge (curves/groupmap.py). The
  device never computes sqrt/Legendre: it recomputes the three x
  candidates and validates host-supplied hints (root, non-squareness
  witnesses, alpha) by squaring, so hints are untrusted.
* Challenges are 128-bit (low bits of a base-field Poseidon squeeze),
  matching kimchi's challenge size.
* The transcript is self-consistent between the host prover and the
  device verifier; official kimchi transcript constants can be swapped in
  at the sponge layer without touching this module.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import groupmap as gm
from ..curves import host as hc
from ..curves import jaxcurve as jc
from ..curves.host import CurveSpec
from ..fields import ff, ffl, host as fh
from ..fields.params import LIMB_BITS, LIMB_MASK, NLIMBS, int_to_limbs
from ..hash import poseidon
from ..hash.poseidon import HostSponge, Sponge
from ..hash.poseidon_params import poseidon_spec
from ..ops import msm as msm_mod
from ..ops import pmsm as pmsm_mod
from ..curves import pallas_kernels as pk


def _msm_impl():
    """Fused Pallas-kernel MSM on TPU; jnp reference path on the CPU
    backend (same results — tests cross-check pmsm against msm). Chosen
    at trace time: the backend is fixed per process."""
    return pmsm_mod if pk.use_pallas() else msm_mod

CHALLENGE_BITS = 128


# ---------------------------------------------------------------------------
# Shared transcript helpers
# ---------------------------------------------------------------------------

def sponge_for(curve: CurveSpec) -> str:
    """Name of the Poseidon instance over the curve's BASE field."""
    return curve.base.name


def _low128_int(x: int) -> int:
    return x & ((1 << CHALLENGE_BITS) - 1)


def _split_scalar(curve: CurveSpec, s: int) -> tuple[int, int]:
    """Scalar-field int -> two base-field absorbable pieces (low128, high)."""
    return _low128_int(s), s >> CHALLENGE_BITS


# Device-side 128-bit mask over canonical limbs: keep limbs 0..8 fully and
# the low (128 - 9*13)=11 bits of limb 9.
_MASK128 = np.zeros(NLIMBS, dtype=np.int32)
_MASK128[:9] = (1 << LIMB_BITS) - 1
_MASK128[9] = (1 << (CHALLENGE_BITS - 9 * LIMB_BITS)) - 1


def squeeze_128(sponge: Sponge) -> jax.Array:
    """Squeeze a 128-bit challenge as canonical 20-limb array (any field)."""
    return sponge.squeeze() & jnp.asarray(_MASK128)


def host_squeeze_128(sponge: HostSponge) -> int:
    return _low128_int(sponge.squeeze())


def endo_to_field(t: int, endo: int, p: int, nbits: int = CHALLENGE_BITS) -> int:
    """Kimchi's ScalarChallenge.to_field: map an nbits-bit challenge t to
    a * endo + b (mod p), crumbs processed MSB-first, crumb j = bits
    (2j+1, 2j) = (hi, lo); hi selects the endo side, sign = 2*lo - 1.
    Matches the EndoMul gate identity: starting from Acc = [2](phi(T)+T),
    the gate chain computes [endo_to_field(t)] T (kimchi/gates.py)."""
    a = b = 2
    for j in reversed(range(nbits // 2)):
        a <<= 1
        b <<= 1
        hi, lo = (t >> (2 * j + 1)) & 1, (t >> (2 * j)) & 1
        s = 2 * lo - 1
        if hi:
            a += s
        else:
            b += s
    return (a * endo + b) % p


def host_endo_chal(curve: CurveSpec, sponge: HostSponge) -> int:
    """Squeeze a 128-bit prechallenge and endo-map it (kimchi oracle)."""
    return endo_to_field(
        host_squeeze_128(sponge), curve.endo_scalar, curve.scalar.p
    )


def endo_to_field_device(spec, endo: int, t_canon: jax.Array) -> jax.Array:
    """Device ScalarChallenge.to_field: (..., NLIMBS) canonical limbs of a
    128-bit challenge -> REP limbs of a*endo + b (mod spec.p).

    Data-parallel closed form of the sequential crumb loop: with crumb
    j = bits (2j+1, 2j) = (hi, lo) and s_j = 2*lo_j - 1,
      a = 2^65 + sum_j hi_j s_j 2^j,   b = 2^65 + sum_j (1-hi_j) s_j 2^j,
    computed without signed bit sums via the two's complement
      a = 2^64 + pack(pos_a) + pack(~neg_a) + 1."""
    lead = t_canon.shape[:-1]
    limbs = t_canon[..., :10]
    sh = jnp.arange(LIMB_BITS, dtype=jnp.int32)
    bits = ((limbs[..., None] >> sh) & 1).reshape(*lead, 130)[..., :128]
    lo, hi = bits[..., 0::2], bits[..., 1::2]  # (..., 64)
    w13 = jnp.asarray([1 << i for i in range(LIMB_BITS)], jnp.int32)

    def val65(pos, negb):
        both = pos + (1 - negb)  # pos + bitwise-not(neg), entries in {0,1,2}
        b65 = jnp.pad(both, [(0, 0)] * (both.ndim - 1) + [(0, 1)])
        vals = (b65.reshape(*lead, 5, LIMB_BITS) * w13).sum(-1)
        vals = vals.at[..., 0].add(1)  # +1 completes the two's complement
        vals = vals.at[..., 4].add(1 << 12)  # +2^64 (bit 64 = limb 4 bit 12)
        return vals

    a5 = val65(hi * lo, hi * (1 - lo))
    b5 = val65((1 - hi) * lo, (1 - hi) * (1 - lo))
    bounds5 = (2 * LIMB_MASK,) * 4 + (2 * LIMB_MASK + (1 << 12) + 1,)
    endo_l = int_to_limbs(endo, NLIMBS)
    prod, pb = ffl._conv(
        a5, bounds5, jnp.asarray(endo_l), tuple(int(v) for v in endo_l)
    )
    prod = prod.at[..., :5].add(b5)
    pb = tuple(pb[i] + (bounds5[i] if i < 5 else 0) for i in range(len(pb)))
    return ffl._rep(spec, prod, pb)


# ---------------------------------------------------------------------------
# Host prover
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class HostOpeningProof:
    lr: list[tuple[tuple[int, int], tuple[int, int]]]  # (L, R) affine pairs
    delta: tuple[int, int]
    z1: int
    z2: int
    sg: tuple[int, int]
    # The folding challenges (prover-side convenience; any verifier
    # re-derives them from the transcript). (chals, sg) is the Pickles
    # accumulator this opening leaves behind (README.md:534-544).
    chals: list = dataclasses.field(default_factory=list)
    # The raw 128-bit PRE-challenges the chals were endo-mapped from:
    # pickles carries these across the field boundary (the endo map to
    # the other curve's scalar field is deferred to where that field is
    # native); the wrap circuit's step-transcript replay re-derives and
    # binds exactly these (pickles/verifier.py, PARITY D7).
    prechals: list = dataclasses.field(default_factory=list)
    # Combined inner product absorbed into the opening transcript
    # (prover-side convenience for transcript replay fillers).
    vprime: int = 0
    # Verifiable hints for the device's U = to_group(t) reconstruction
    # (curves/groupmap.py). Untrusted: the device validates by squaring.
    u_hints: gm.UHints | None = None


def host_commit(
    curve: CurveSpec, g: list, h, coeffs: list[int], blind: int
):
    """Pedersen commitment <coeffs, g> + blind*h."""
    acc = hc.msm(curve, coeffs, g[: len(coeffs)])
    return hc.add(curve, acc, hc.mul(curve, blind, h))


def host_b_poly(chals: list[int], x: int, p: int) -> int:
    """h(x) = prod_i (1 + chals[k-1-i] * x^(2^i))."""
    k = len(chals)
    out = 1
    xp = x % p
    for i in range(k):
        out = out * (1 + chals[k - 1 - i] * xp) % p
        xp = xp * xp % p
    return out


def host_s_vector(chals: list[int], p: int) -> list[int]:
    """Coefficient vector of h(X) (length 2^k)."""
    k = len(chals)
    s = [1]
    for r in range(k):
        u = chals[k - 1 - r]
        s = s + [si * u % p for si in s]
    return s


class HostIpaProver:
    """Opens a batch of polynomial evaluations with one IPA proof.

    Protocol (mirrored exactly by `batch_verify` on device):
      inputs: polynomials f_i (coeff lists) with blinds r_i, commitments
      C_i; evaluation points x_j.
      transcript (Poseidon over base field):
        absorb C_i (x, y) for each i
        squeeze v (polyscale, 128b); squeeze u (evalscale, 128b)
        [combined poly f = sum v^i f_i;  combined blind r = sum v^i r_i]
        [claimed combined inner product v' = sum_{i,j} v^i u^j f_i(x_j)]
        absorb v' (two pieces); squeeze t; U = t*J
        k rounds: absorb L, R; squeeze 128b challenge u_r
        absorb delta; squeeze c
    """

    def __init__(self, curve: CurveSpec, g: list, h, rng):
        self.curve = curve
        self.g = g
        self.h = h
        self.rng = rng

    def open(
        self, polys, blinds, commitments, eval_points, sponge=None, v=None, u=None
    ):
        curve = self.curve
        pb, ps = curve.base.p, curve.scalar.p
        n = len(self.g)
        k = n.bit_length() - 1
        assert 1 << k == n
        if sponge is None:
            sponge = HostSponge(poseidon_spec(sponge_for(curve)))
            for pt in commitments:
                sponge.absorb(pt[0] if pt else 0)
                sponge.absorb(pt[1] if pt else 0)
            v = host_endo_chal(curve, sponge)
            u = host_endo_chal(curve, sponge)
        assert v is not None and u is not None

        # combined polynomial and claimed inner product
        f = [0] * n
        for i, poly in enumerate(polys):
            vi = pow(v, i, ps)
            for d, cd in enumerate(poly):
                f[d] = (f[d] + vi * cd) % ps
        r = 0
        for i, b in enumerate(blinds):
            r = (r + pow(v, i, ps) * b) % ps
        vprime = 0
        for j, x in enumerate(eval_points):
            uj = pow(u, j, ps)
            fx = 0
            for d in reversed(range(n)):
                fx = (fx * x + f[d]) % ps
            vprime = (vprime + uj * fx) % ps
        lo, hi = _split_scalar(curve, vprime)
        sponge.absorb(lo)
        sponge.absorb(hi)
        t = sponge.squeeze()  # full base-field challenge for the group map
        U, u_hints = gm.to_group_hints(curve, t)

        # b vector: sum_j u^j (1, x_j, x_j^2, ...)
        b = [0] * n
        for j, x in enumerate(eval_points):
            uj = pow(u, j, ps)
            xp = 1
            for d in range(n):
                b[d] = (b[d] + uj * xp) % ps
                xp = xp * x % ps

        gv = list(self.g)
        a = list(f)
        bv = list(b)
        lr = []
        chals = []
        prechals = []
        r_acc = r
        for _ in range(k):
            m = len(a) // 2
            a_lo, a_hi = a[:m], a[m:]
            b_lo, b_hi = bv[:m], bv[m:]
            g_lo, g_hi = gv[:m], gv[m:]
            rl = self.rng.randrange(ps)
            rr = self.rng.randrange(ps)
            ip_l = sum(ai * bi for ai, bi in zip(a_hi, b_lo)) % ps
            ip_r = sum(ai * bi for ai, bi in zip(a_lo, b_hi)) % ps
            L = hc.add(
                curve,
                hc.add(curve, hc.msm(curve, a_hi, g_lo), hc.mul(curve, rl, self.h)),
                hc.mul(curve, ip_l, U),
            )
            R = hc.add(
                curve,
                hc.add(curve, hc.msm(curve, a_lo, g_hi), hc.mul(curve, rr, self.h)),
                hc.mul(curve, ip_r, U),
            )
            assert L is not None and R is not None
            lr.append((L, R))
            sponge.absorb(L[0]), sponge.absorb(L[1])
            sponge.absorb(R[0]), sponge.absorb(R[1])
            pre = host_squeeze_128(sponge)
            ch = endo_to_field(pre, curve.endo_scalar, curve.scalar.p)
            prechals.append(pre)
            chals.append(ch)
            ch_inv = fh.finv(curve.scalar, ch)
            # fold: a' = a_lo + ch_inv * a_hi ; b' = b_lo + ch*b_hi ; g' = g_lo + ch*g_hi
            a = [(al + ch_inv * ah) % ps for al, ah in zip(a_lo, a_hi)]
            bv = [(bl + ch * bh) % ps for bl, bh in zip(b_lo, b_hi)]
            gv = [
                hc.add(curve, gl, hc.mul(curve, ch, gh))
                for gl, gh in zip(g_lo, g_hi)
            ]
            r_acc = (r_acc + ch_inv * rl + ch * rr) % ps

        a0, b0, g_final = a[0], bv[0], gv[0]
        sg = g_final
        assert sg is not None
        # Schnorr wrap on basis (Q = g_final + b0*U, H)
        d = self.rng.randrange(ps)
        s_d = self.rng.randrange(ps)
        Q = hc.add(curve, g_final, hc.mul(curve, b0, U))
        delta = hc.add(curve, hc.mul(curve, d, Q), hc.mul(curve, s_d, self.h))
        assert delta is not None
        sponge.absorb(delta[0]), sponge.absorb(delta[1])
        c = host_endo_chal(curve, sponge)
        z1 = (d + c * a0) % ps
        z2 = (s_d + c * r_acc) % ps
        proof = HostOpeningProof(
            lr=lr,
            delta=delta,
            z1=z1,
            z2=z2,
            sg=sg,
            chals=list(chals),
            prechals=list(prechals),
            vprime=vprime,
            u_hints=u_hints,
        )
        return proof, {
            "v": v,
            "u": u,
            "t": t,
            "chals": chals,
            "vprime": vprime,
            "b0": b0,
        }


# ---------------------------------------------------------------------------
# Host verifier (debugging oracle for the device path)
# ---------------------------------------------------------------------------

def host_verify(
    curve: CurveSpec,
    g: list,
    h,
    commitments,
    eval_points,
    evals,
    proof: HostOpeningProof,
    sponge=None,
    v=None,
    u=None,
) -> bool:
    ps = curve.scalar.p
    n = len(g)
    k = n.bit_length() - 1
    if sponge is None:
        sponge = HostSponge(poseidon_spec(sponge_for(curve)))
        for pt in commitments:
            sponge.absorb(pt[0] if pt else 0)
            sponge.absorb(pt[1] if pt else 0)
        v = host_endo_chal(curve, sponge)
        u = host_endo_chal(curve, sponge)
    vprime = 0
    for i in range(len(commitments)):
        for j in range(len(eval_points)):
            vprime = (vprime + pow(v, i, ps) * pow(u, j, ps) * evals[i][j]) % ps
    lo, hi = _split_scalar(curve, vprime)
    sponge.absorb(lo)
    sponge.absorb(hi)
    t = sponge.squeeze()
    U = gm.to_group(curve, t)
    chals = []
    for L, R in proof.lr:
        sponge.absorb(L[0]), sponge.absorb(L[1])
        sponge.absorb(R[0]), sponge.absorb(R[1])
        chals.append(host_endo_chal(curve, sponge))
    sponge.absorb(proof.delta[0]), sponge.absorb(proof.delta[1])
    c = host_endo_chal(curve, sponge)

    b0 = 0
    for j, x in enumerate(eval_points):
        b0 = (b0 + pow(u, j, ps) * host_b_poly(chals, x, ps)) % ps
    s = host_s_vector(chals, ps)
    # sg must commit to h(X)
    if hc.msm(curve, s, g) != proof.sg:
        return False
    # main Schnorr equation
    Cc = None
    for i, Ci in enumerate(commitments):
        Cc = hc.add(curve, Cc, hc.mul(curve, pow(v, i, ps), Ci))
    P = hc.add(curve, Cc, hc.mul(curve, vprime, U))
    for (L, R), ch in zip(proof.lr, chals):
        P = hc.add(curve, P, hc.mul(curve, fh.finv(curve.scalar, ch), L))
        P = hc.add(curve, P, hc.mul(curve, ch, R))
    lhs = hc.add(
        curve,
        hc.mul(
            curve, proof.z1, hc.add(curve, proof.sg, hc.mul(curve, b0, U))
        ),
        hc.mul(curve, proof.z2, h),
    )
    rhs = hc.add(curve, proof.delta, hc.mul(curve, c, P))
    return lhs == rhs


# ---------------------------------------------------------------------------
# Device batched verifier
# ---------------------------------------------------------------------------

def aff_to_rep(pts: jax.Array) -> jax.Array:
    """(..., 2, NLIMBS) canonical affine -> (..., 3, REP_LIMBS) projective.

    (0,0) encodes the identity (not on the curve, so unambiguous). The
    identity MUST map to the representative (0:1:0), NOT (0:0:0): the
    all-zero triple is an *absorbing* element of the complete RCB
    formulas (every output term carries a zero factor, so P + (0,0,0) =
    (0,0,0) which reads as "identity") — it silently collapsed any MSM
    containing an identity commitment row to the identity, making the
    batched-opening soundness check vacuous (round-3 fix; the verifier's
    public/ft/t_joint commitment slots are always identity rows)."""
    x = ffl.from_canon(pts[..., 0, :])
    y = ffl.from_canon(pts[..., 1, :])
    inf = jnp.all(pts == 0, axis=(-1, -2))
    y = y.at[..., 0].set(jnp.where(inf, 1, y[..., 0]))
    z = jnp.zeros_like(x).at[..., 0].set(jnp.where(inf, 0, 1))
    return jnp.stack([x, y, z], axis=-2)


def device_s_vector(spec, chals: list[jax.Array], n: int) -> jax.Array:
    """Coefficient vector of h(X) = prod_i (1 + chals[k-1-i] X^(2^i)):
    (B, n, REP) built in k doubling steps from (B, L) REP challenges.

    s[j] = prod over the set bits r of j of chals[k-1-r]. Doubling steps
    grow by CONCATENATION, not .at[].set: an n-sized buffer updated in
    place k times lowers to k full-size dynamic-update-slice copies
    (~5 GB of HBM traffic at B=32, n=2^16 — measured, it OOMs compiled
    in isolation on a 16 GB chip)."""
    k = len(chals)
    assert 1 << k == n
    B = chals[0].shape[0]
    s = jnp.zeros((B, 1, ffl.REP_LIMBS), jnp.int32).at[:, 0, 0].set(1)
    for r in range(k):
        blk = ffl.mul(spec, s, chals[k - 1 - r][:, None])
        s = jnp.concatenate([s, blk], axis=1)
    return s


def device_rho_s_sum(spec, chals: list[jax.Array], rho: jax.Array, n: int) -> jax.Array:
    """Canonical (n, NLIMBS) G-row scalars -sum_b rho_b * s_b in one pass.

    The batched opening's SRS-row scalars need only the rho-weighted
    BATCH SUM of the per-proof s vectors, never the (B, n) matrix
    itself. Split j = j_hi * 2^k_lo + j_lo: s_b[j] factors as
    s_lo_b[j_lo] * s_hi_b[j_hi] (disjoint bit ranges of the same
    product), so

        -sum_b rho_b s_b[j] = sum_b ((-rho_b) s_hi_b[j_hi]) * s_lo_b[j_lo]

    builds two 2^(k/2)-sized halves (tiny), one broadcasted outer
    product, and the existing batch tree-sum — ~3 full-size buffers of
    traffic instead of device_s_vector's k, and the -rho weight rides
    the cheap hi half. Bit-identical to the unfused path (tested)."""
    k = len(chals)
    assert 1 << k == n
    if k < 2:
        s = device_s_vector(spec, chals, n)
        w = ffl.mul(spec, ffl.neg(spec, rho)[:, None], s)
        return ffl.canon(spec, _sum_over_batch(spec, w, axis=0))
    k_lo = (k + 1) // 2
    # low bits r=0..k_lo-1 use chals[k-1-r]; high bits the rest
    s_lo = device_s_vector(spec, chals[k - k_lo :], 1 << k_lo)
    s_hi = device_s_vector(spec, chals[: k - k_lo], 1 << (k - k_lo))
    w_hi = ffl.mul(spec, ffl.neg(spec, rho)[:, None], s_hi)  # (B, n_hi, L)
    prod = ffl.mul(spec, w_hi[:, :, None], s_lo[:, None])  # (B, n_hi, n_lo, L)
    total = _sum_over_batch(spec, prod, axis=0)  # (n_hi, n_lo, L)
    return ffl.canon(spec, total).reshape(n, -1)


@functools.partial(jax.jit, static_argnums=0)
def batch_decide(
    curve: CurveSpec,
    g_affine: jax.Array,  # (n, 2, NLIMBS)
    acc_prechals: jax.Array,  # (B, k, NLIMBS) canonical 128-bit values
    acc_sg: jax.Array,  # (B, 2, NLIMBS)
    weights: jax.Array,  # (B, NLIMBS) verifier randomness
) -> jax.Array:
    """The Pickles 'decider': check B deferred accumulator claims
    sg_b == <s(chals_b), G> with ONE random-linear-combination MSM
    (sum_b w_b (sg_b - <s_b, G>) == identity). This is the step-side
    check the wrap circuit defers (reference README.md:534-544).

    The accumulator carries raw 128-bit PRE-challenges (what crosses
    the Pasta cycle boundary in pickles); the endo map into this
    curve's scalar field happens here, where that field is native."""
    fs = curve.scalar
    B, k = acc_prechals.shape[:2]
    n = g_affine.shape[0]
    mask = jnp.asarray(_MASK128)
    chals = [
        endo_to_field_device(
            fs, curve.endo_scalar, acc_prechals[:, i] & mask
        )
        for i in range(k)
    ]
    w = ffl.from_canon(weights)
    sc_g = device_rho_s_sum(fs, chals, w, n)  # (n, NLIMBS)
    points = jnp.concatenate([aff_to_rep(g_affine), aff_to_rep(acc_sg)], axis=0)
    scalars = jnp.concatenate([sc_g, ffl.canon(fs, w)], axis=0)
    result = _msm_impl().msm(curve, scalars, points)
    return jc.is_identity(curve, result)

@dataclasses.dataclass
class DeviceOpenings:
    """A batch of B structurally identical opening claims (device arrays).

    commitments: (B, m, 2, NLIMBS) canonical affine points
    evals:       (B, m, npts, NLIMBS) claimed evaluations (scalar field)
    eval_points: (B, npts, NLIMBS)
    lr:          (B, k, 2, 2, NLIMBS)
    delta, sg:   (B, 2, NLIMBS)
    z1, z2:      (B, NLIMBS)
    u_sel:       (B, 3) int32 one-hot SvdW branch (groupmap hint)
    u_hint:      (B, 4, NLIMBS) rows y, w0, w1, alpha (groupmap hints)
    """

    commitments: jax.Array
    evals: jax.Array
    eval_points: jax.Array
    lr: jax.Array
    delta: jax.Array
    sg: jax.Array
    z1: jax.Array
    z2: jax.Array
    u_sel: jax.Array
    u_hint: jax.Array


def u_hint_arrays(proofs: list[HostOpeningProof]) -> tuple[np.ndarray, np.ndarray]:
    """Stack (u_sel (B,3), u_hint (B,4,NLIMBS)) from host opening proofs."""
    B = len(proofs)
    sel = np.zeros((B, 3), np.int32)
    hint = np.zeros((B, 4, NLIMBS), np.int32)
    for b, pr in enumerate(proofs):
        uh = pr.u_hints
        sel[b, uh.sel] = 1
        hint[b, 0] = int_to_limbs(uh.y, NLIMBS)
        hint[b, 1] = int_to_limbs(uh.wits[0], NLIMBS)
        hint[b, 2] = int_to_limbs(uh.wits[1], NLIMBS)
        hint[b, 3] = int_to_limbs(uh.alpha, NLIMBS)
    return sel, hint


def _split_128_device(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Canonical 20-limb -> (low 128 bits, high bits) canonical arrays."""
    lo = x & jnp.asarray(_MASK128)
    sh = CHALLENGE_BITS - 9 * LIMB_BITS  # 11
    hi = jnp.zeros_like(x)
    # high limbs: value >> 128, re-expressed in 13-bit limbs
    hpart = jnp.concatenate(
        [x[..., 9:], jnp.zeros(x.shape[:-1] + (9,), x.dtype)], axis=-1
    )
    hi = (hpart >> sh) | ((jnp.roll(hpart, -1, axis=-1) & ((1 << sh) - 1)) << (LIMB_BITS - sh))
    hi = hi.at[..., -9:].set(0)
    return lo, hi


def _powers(spec, base_rep: jax.Array, count: int) -> list[jax.Array]:
    """[1, b, b^2, ...] as REP arrays via doubling (log(count) mul calls)."""
    pows = jnp.broadcast_to(ffl.ones(spec), base_rep.shape).astype(jnp.int32)[
        None
    ]  # (1, ..., L)
    sq = base_rep  # base^(2^t)
    while pows.shape[0] < count:
        block = ffl.mul(spec, pows, sq[None])  # one batched call
        pows = jnp.concatenate([pows, block], axis=0)[: max(count, 1)]
        if pows.shape[0] < count:
            sq = ffl.square(spec, sq)
    return [pows[i] for i in range(count)]


def batch_verify(
    curve: CurveSpec,
    g_affine: jax.Array,  # (n, 2, NLIMBS) canonical affine SRS
    h_affine: jax.Array,  # (2, NLIMBS)
    openings: DeviceOpenings,
    rand_weights: jax.Array,  # (B, 2, NLIMBS): (w_b, rho_b) verifier randomness
    sponge=None,
    v=None,
    u=None,
    virtual_rows=(),
    extra_pairs=(),
    bind_prechals=None,
) -> jax.Array:
    """Verify a batch of opening proofs with ONE combined MSM (bool result).

    bind_prechals: optional (B, k, NLIMBS) canonical 128-bit values; when
    given, the verdict additionally requires the opening transcript's raw
    folding PRE-challenges (the masked squeezes the endo map is applied
    to) to equal them — the pickles step-accumulator linkage: the wrap
    proof's deferred digest binds exactly these prechallenges, so the
    caller can tie "the step proof this verify checked" to "the
    accumulator the wrap proof committed to" (pickles/verifier.py
    batch_verify_tips, PARITY D7).

    extra_pairs: additional (affine_points, lazy_scalar) pairs folded
    into the same MSM — used by callers to bind side claims (e.g. the
    kimchi verifier's host-hinted public commitment) under their own
    verifier-random weight by Schwartz-Zippel.

    virtual_rows: rows of the v-combine whose commitment is a linear
    combination of OTHER points (e.g. kimchi's ft linearization and
    public-input rows). Each entry is (row_idx, points, lam):
      points: (2, NLIMBS) broadcast or (B, 2, NLIMBS) per-proof affine
      lam:    (B, REP_LIMBS) scalar-field coefficient
    The row's slot in openings.commitments must hold the identity (0,0);
    this function adds lam * points into the MSM with the row's own
    v-combine coefficient, so the commitment C_row = sum lam_j P_j never
    needs affine normalization on device."""
    fs = curve.scalar
    B, m = openings.commitments.shape[:2]
    npts = openings.eval_points.shape[1]
    n = g_affine.shape[0]
    k = openings.lr.shape[1]
    assert 1 << k == n, "lr rounds must match SRS size"

    ps_sponge = poseidon_spec(sponge_for(curve))
    mask128 = jnp.asarray(_MASK128)
    if sponge is None:
        ops = []
        for i in range(m):
            ops.append(("absorb", openings.commitments[:, i, 0]))
            ops.append(("absorb", openings.commitments[:, i, 1]))
        ops += [("squeeze",), ("squeeze",)]
        (v, u), sponge = poseidon.run_transcript(ps_sponge, ops, batch_shape=(B,))
        v = endo_to_field_device(fs, curve.endo_scalar, v & mask128)
        u = endo_to_field_device(fs, curve.endo_scalar, u & mask128)
    else:
        v = ffl.from_canon(v) if v.shape[-1] == NLIMBS else v
        u = ffl.from_canon(u) if u.shape[-1] == NLIMBS else u

    v_pows = _powers(fs, v, m)
    u_pows = _powers(fs, u, npts)
    # vprime = sum_{i,j} v^i u^j evals[i,j]: fully batched (3 mul calls)
    vp_stack = jnp.stack(v_pows)  # (m, B, L)
    up_stack = jnp.stack(u_pows)  # (npts, B, L)
    coeff = ffl.mul(fs, vp_stack[:, None], up_stack[None, :])  # (m,npts,B,L)
    ev_rep = ffl.from_canon(jnp.moveaxis(openings.evals, 0, 2))  # (m,npts,B,L)
    terms = ffl.mul(fs, coeff, ev_rep).reshape(m * npts, B, ffl.REP_LIMBS)
    vprime = _sum_over_batch(fs, terms, axis=0)
    vprime_c = ffl.canon(fs, vprime)
    lo, hi = _split_128_device(vprime_c)
    ops = [("absorb", lo), ("absorb", hi), ("squeeze",)]
    for r in range(k):
        ops.append(("absorb", openings.lr[:, r, 0, 0]))
        ops.append(("absorb", openings.lr[:, r, 0, 1]))
        ops.append(("absorb", openings.lr[:, r, 1, 0]))
        ops.append(("absorb", openings.lr[:, r, 1, 1]))
        ops.append(("squeeze",))
    ops += [("absorb", openings.delta[:, 0]), ("absorb", openings.delta[:, 1]), ("squeeze",)]
    sq, _ = poseidon.run_transcript(ps_sponge, ops, sponge=sponge)
    # U = to_group(t): full base-field challenge, hint-validated on device
    u_aff, u_ok = gm.device_u_points(
        curve,
        ffl.from_canon(sq[0]),
        openings.u_sel,
        openings.u_hint[:, 0],
        openings.u_hint[:, 1:3],
        openings.u_hint[:, 3],
    )
    endo = curve.endo_scalar
    prechal_ok = jnp.asarray(True)
    if bind_prechals is not None:
        raw = jnp.stack([x & mask128 for x in sq[1 : 1 + k]], axis=1)
        prechal_ok = jnp.all(raw == bind_prechals)
    chals = [endo_to_field_device(fs, endo, x & mask128) for x in sq[1 : 1 + k]]
    c = endo_to_field_device(fs, endo, sq[1 + k] & mask128)
    chal_stack = jnp.stack(chals)  # (k, B, L)
    chal_inv_stack = ffl.inv(fs, chal_stack)
    chal_invs = [chal_inv_stack[i] for i in range(k)]

    # b0 = sum_j u^j prod_i (1 + chals[k-1-i] x_j^(2^i))
    xs = ffl.from_canon(openings.eval_points)  # (B, npts, L)
    hval = jnp.broadcast_to(ffl.ones(fs), xs.shape).astype(jnp.int32)
    xp = xs
    one = jnp.broadcast_to(ffl.ones(fs), xs.shape).astype(jnp.int32)
    for i in range(k):
        term = ffl.add(fs, one, ffl.mul(fs, chals[k - 1 - i][:, None], xp))
        hval = ffl.mul(fs, hval, term)
        xp = ffl.square(fs, xp)
    b0 = ffl.zeros(fs, (B,))
    for j in range(npts):
        b0 = ffl.add(fs, b0, ffl.mul(fs, u_pows[j], hval[:, j]))

    w = ffl.from_canon(rand_weights[:, 0])
    rho = ffl.from_canon(rand_weights[:, 1])

    # --- scalar assembly ---
    neg = lambda x: ffl.neg(fs, x)
    mulf = lambda a, b: ffl.mul(fs, a, b)
    z1 = ffl.from_canon(openings.z1)
    z2 = ffl.from_canon(openings.z2)
    wc = mulf(w, c)

    sc_h = _sum_over_batch(fs, mulf(w, z2))  # H
    sc_u = ffl.canon(
        fs, mulf(w, ffl.sub(fs, mulf(z1, b0), mulf(c, vprime)))
    )  # (B, 20): per-proof U = to_group(t) coefficient
    sc_g = device_rho_s_sum(fs, chals, rho, n)  # (n, 20)
    sc_sg = ffl.canon(fs, ffl.add(fs, mulf(w, z1), rho))  # (B, 20)
    sc_delta = ffl.canon(fs, neg(w))
    sc_l = ffl.canon(
        fs, neg(mulf(wc[None], chal_inv_stack)).transpose(1, 0, 2)
    )  # (B, k, 20)
    sc_r = ffl.canon(fs, neg(mulf(wc[None], chal_stack)).transpose(1, 0, 2))
    sc_comm = ffl.canon(
        fs, neg(mulf(wc[None], vp_stack)).transpose(1, 0, 2)
    )  # (B, m, 20)

    # virtual rows: add lam * P with the row's v-combine coefficient
    extra_points = []
    extra_scalars = []
    for row_idx, pts_aff, lam in virtual_rows:
        coeff = neg(mulf(mulf(wc, v_pows[row_idx]), lam))  # (B, L)
        if pts_aff.ndim == 2:
            pts_aff = jnp.broadcast_to(pts_aff, (B,) + pts_aff.shape)
        extra_points.append(aff_to_rep(pts_aff))
        extra_scalars.append(ffl.canon(fs, coeff))
    for pts_aff, lam in extra_pairs:
        if pts_aff.ndim == 2:
            pts_aff = jnp.broadcast_to(pts_aff, (B,) + pts_aff.shape)
        if lam.ndim == 1:
            lam = jnp.broadcast_to(lam, (B,) + lam.shape)
        extra_points.append(aff_to_rep(pts_aff))
        extra_scalars.append(ffl.canon(fs, lam))

    # --- point assembly ---
    points = jnp.concatenate(
        [
            aff_to_rep(h_affine)[None],
            aff_to_rep(u_aff),
            aff_to_rep(g_affine),
            aff_to_rep(openings.sg),
            aff_to_rep(openings.delta),
            aff_to_rep(openings.lr[:, :, 0]).reshape(-1, 3, ffl.REP_LIMBS),
            aff_to_rep(openings.lr[:, :, 1]).reshape(-1, 3, ffl.REP_LIMBS),
            aff_to_rep(openings.commitments).reshape(-1, 3, ffl.REP_LIMBS),
        ]
        + extra_points,
        axis=0,
    )
    scalars = jnp.concatenate(
        [
            ffl.canon(fs, sc_h)[None],
            sc_u,
            sc_g,
            sc_sg,
            jnp.broadcast_to(sc_delta, (B, NLIMBS)) if sc_delta.ndim == 1 else sc_delta,
            sc_l.reshape(-1, NLIMBS),
            sc_r.reshape(-1, NLIMBS),
            sc_comm.reshape(-1, NLIMBS),
        ]
        + extra_scalars,
        axis=0,
    )
    result = _msm_impl().msm(curve, scalars, points)
    ok = jnp.logical_and(jc.is_identity(curve, result), jnp.all(u_ok))
    return jnp.logical_and(ok, prechal_ok)


def _sum_over_batch(spec, x: jax.Array, axis: int = 0) -> jax.Array:
    out = x
    n = out.shape[axis]
    while n > 1:
        half = n // 2
        a = jax.lax.slice_in_dim(out, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(out, half, 2 * half, axis=axis)
        rem = jax.lax.slice_in_dim(out, 2 * half, n, axis=axis)
        out = ffl.add(spec, a, b)
        if rem.shape[axis]:
            out = jnp.concatenate([out, rem], axis=axis)
        n = out.shape[axis]
    return jnp.squeeze(out, axis=axis)
