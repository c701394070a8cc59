"""Lazy (redundant) Pasta field arithmetic — the scan-free TPU hot path.

The canonical module (ff.py) finishes every op with exact sequential carry
propagation (lax.scan), which is correct but serializes ~130 dependent
steps per multiply — poison for TPU VPU throughput. This module instead
keeps elements in a *redundant representation*:

    REP: 22 int32 limbs (little-endian base 2^13), each in [0, 8255],
         value in [0, ~2^273); value is unique only modulo p.

and guarantees only *static per-limb bounds*, never canonical limbs.
All carry handling is a small number of data-parallel "split + shifted
add" rounds whose trip count is derived at trace time from the tracked
bounds — zero sequential scans, zero branches, identical work per lane.

Reduction never produces negative intermediates: instead of subtracting
the fold term conv(hi, 64*t0) (where 2^260 === -64*t0 mod p), we first add
a *spread offset* — a multiple of p precomputed in a non-canonical limb
form whose every limb dominates the per-position bound of the subtrahend.
Three folds bring a 44-limb product back to REP.

Bounds are tracked as Python tuples alongside the traced arrays; every
public op takes REP-bounded inputs and returns REP-bounded outputs, with
all offset constants cached per static bound signature. `canon()` (exact,
scan-based) is only used at protocol boundaries (serialization, equality,
challenge extraction).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldSpec, int_to_limbs
from . import ff as ffc

REP_LIMBS = 22
LOOSE = LIMB_MASK + 64  # 8255: max loose limb value in REP
_MAX_LIMB = (1 << 31) - (1 << 27)  # headroom guard for int32 accumulation
REP_BOUNDS = (LOOSE,) * REP_LIMBS

Bounds = tuple[int, ...]

__all__ = [
    "REP_LIMBS",
    "zeros",
    "ones",
    "from_canon",
    "canon",
    "add",
    "sub",
    "neg",
    "mul",
    "square",
    "mul_small",
    "pow_const",
    "inv",
    "from_int",
    "from_ints",
    "to_int",
    "to_ints",
]


# ---------------------------------------------------------------------------
# Static bound machinery (pure Python, runs at trace time)
# ---------------------------------------------------------------------------

def _conv_bounds(ba: Bounds, bb: Bounds) -> Bounds:
    out = [0] * (len(ba) + len(bb) - 1)
    for i, x in enumerate(ba):
        for j, y in enumerate(bb):
            out[i + j] += x * y
    assert all(v < (1 << 31) for v in out), "conv bound overflow"
    return tuple(out)


def _bounds_value(b: Bounds) -> int:
    return sum(v << (LIMB_BITS * i) for i, v in enumerate(b))


@functools.cache
def _spread_offset(spec: FieldSpec, minima: Bounds) -> tuple[np.ndarray, Bounds]:
    """A multiple of p in non-canonical limb form with limb_i >= minima_i.

    Greedy top-down redistribution of canonical limbs; asserts the result.
    """
    target = _bounds_value(minima)
    m = target // spec.p + 2
    value = m * spec.p
    rest = value - target  # >= p > 0
    nl = max(len(minima), (rest.bit_length() + LIMB_BITS - 1) // LIMB_BITS)
    rest_limbs = int_to_limbs(rest, nl)
    minima_l = list(minima) + [0] * (nl - len(minima))
    limbs = [int(minima_l[i]) + int(rest_limbs[i]) for i in range(nl)]
    assert all(minima_l[i] <= v < _MAX_LIMB for i, v in enumerate(limbs))
    assert sum(v << (LIMB_BITS * i) for i, v in enumerate(limbs)) == value
    return np.array(limbs, dtype=np.int32), tuple(limbs)


@functools.cache
def _fold_const(spec: FieldSpec) -> tuple[np.ndarray, Bounds]:
    """Limbs of 64*t0, with 2^260 === -(64*t0) (mod p)."""
    c = spec.fold_c
    nl = (c.bit_length() + LIMB_BITS - 1) // LIMB_BITS
    arr = int_to_limbs(c, nl)
    return arr, tuple(int(v) for v in arr)


@functools.cache
def _fold_matrix(spec: FieldSpec, nhi: int) -> tuple[np.ndarray, tuple]:
    """(nhi, 20) int32: row j = canonical 20 limbs of 2^(13*(20+j)) mod p.

    One-shot positive fold: for normalized input x (limbs <= LOOSE),
    value === sum_{i<20} x_i 2^(13i) + sum_j x_{20+j} * row_j (mod p),
    with every accumulated output limb < nhi * LOOSE * 8191 < 2^31 for
    nhi <= 31 — no negative intermediates, no spread offsets, and no
    fold cascade (the legacy conv-with-64*t0 fold re-expands into high
    limbs and needs 3 fold+normalize rounds to terminate)."""
    assert nhi <= 31, "fold-matrix accumulation would overflow int32"
    rows_ = [
        int_to_limbs(pow(2, LIMB_BITS * (20 + j), spec.p), 20)
        for j in range(nhi)
    ]
    mat = np.stack(rows_).astype(np.int32) if nhi else np.zeros((0, 20), np.int32)
    return mat, tuple(tuple(int(v) for v in r) for r in rows_)


@functools.cache
def _fold_mode() -> str:
    """'matrix' (one-shot positive fold, default) or 'legacy' (3-stage
    conv fold with spread offsets). Override: MINA_BRIDGE_TPU_FOLD."""
    import os

    mode = os.environ.get("MINA_BRIDGE_TPU_FOLD", "matrix")
    assert mode in ("matrix", "legacy")
    return mode


# ---------------------------------------------------------------------------
# Carry rounds and convolution on (array, bounds) pairs
# ---------------------------------------------------------------------------

def _carry_round(x: jax.Array, bounds: Bounds) -> tuple[jax.Array, Bounds]:
    """One vectorized split-and-add carry round (non-negative input)."""
    c = x >> LIMB_BITS
    y = x & LIMB_MASK
    y = y.at[..., 1:].add(c[..., :-1])
    nb = [min(b, LIMB_MASK) for b in bounds]
    for i in range(1, len(bounds)):
        nb[i] += bounds[i - 1] >> LIMB_BITS
    top_carry = bounds[-1] >> LIMB_BITS
    if top_carry > 0:
        y = jnp.concatenate([y, c[..., -1:]], axis=-1)
        nb.append(top_carry)
    assert all(v < (1 << 31) for v in nb)
    return y, tuple(nb)


def _normalize(
    x: jax.Array, bounds: Bounds, limit: int = LOOSE
) -> tuple[jax.Array, Bounds]:
    while any(b > limit for b in bounds):
        x, bounds = _carry_round(x, bounds)
    return x, bounds


@functools.cache
def _compact_conv() -> bool:
    """Use the low-HLO-count convolution formulation?

    The unrolled schoolbook/Karatsuba emits ~22-44 dynamic-update-slices
    per field multiply; with hundreds of multiplies in the verifier the
    CPU-backend XLA compile (2-core driver boxes, multichip dryrun) takes
    tens of minutes. The compact path emits ~6 HLO ops per multiply with
    the same integer arithmetic (identical per-position bounds) and a
    comparable runtime op count, so it is the default on CPU. TPU keeps
    the unrolled form (measured faster through the fused Pallas path).
    Override with MINA_BRIDGE_TPU_CONV=compact|unrolled.
    """
    import os

    mode = os.environ.get("MINA_BRIDGE_TPU_CONV", "")
    if mode in ("compact", "unrolled"):
        return mode == "compact"
    return jax.default_backend() == "cpu"


def _conv_diag(
    a: jax.Array, ba: Bounds, b: jax.Array, bb: Bounds
) -> tuple[jax.Array, Bounds]:
    """conv via outer product + anti-diagonal sums (compile-compact).

    The (la, lb) outer product is padded to row width lb + la, flattened,
    truncated and re-viewed at row width lb + la - 1: row i of the new
    view is the original row right-shifted by i, so summing rows yields
    exactly the convolution's anti-diagonal sums (same int32 bound as
    schoolbook, asserted by _conv_bounds)."""
    la, lb = len(ba), len(bb)
    lead = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    outer = a[..., :, None] * b[..., None, :]  # (..., la, lb)
    outer = jnp.broadcast_to(outer, lead + (la, lb))
    w = lb + la - 1
    padded = jnp.pad(outer, [(0, 0)] * len(lead) + [(0, 0), (0, la)])
    flat = padded.reshape(lead + (la * (lb + la),))[..., : la * w]
    return flat.reshape(lead + (la, w)).sum(axis=-2), _conv_bounds(ba, bb)


def _conv_schoolbook(
    a: jax.Array, ba: Bounds, b: jax.Array, bb: Bounds
) -> tuple[jax.Array, Bounds]:
    la, lb = len(ba), len(bb)
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    out = jnp.zeros(shape + (la + lb - 1,), dtype=jnp.int32)
    if lb <= la:
        for j in range(lb):
            out = out.at[..., j : j + la].add(a * b[..., j : j + 1])
    else:
        for i in range(la):
            out = out.at[..., i : i + lb].add(b * a[..., i : i + 1])
    return out, _conv_bounds(ba, bb)


def _kara_halves(ba: Bounds, bb: Bounds):
    """Split-point + per-half diff bounds for the subtractive Karatsuba
    step (uneven splits pad the high half with zeros)."""
    la = len(ba)
    h = (la + 1) // 2
    pad = lambda t: t + (0,) * (h - len(t))
    bd_a = tuple(max(x, y) for x, y in zip(ba[:h], pad(ba[h:])))
    bd_b = tuple(max(x, y) for x, y in zip(bb[:h], pad(bb[h:])))
    return h, bd_a, bd_b


@functools.cache
def _karatsuba_safe(ba: Bounds, bb: Bounds) -> bool:
    """Subtractive Karatsuba is exact in int32 iff the middle product of
    limb differences and the z0+z2 intermediate stay < 2^31 (the output
    limbs equal schoolbook limbs, same bound tuple; z1 = z0 + z2 - m is
    the true non-negative middle convolution, transients fit signed
    int32)."""
    la, lb = len(ba), len(bb)
    if la != lb or la < 8:
        return False
    h, bd_a, bd_b = _kara_halves(ba, bb)
    bm = [0] * (2 * h - 1)
    bz = [0] * (2 * h - 1)  # z0 + z2 positional bound
    for i in range(h):
        for j in range(h):
            bm[i + j] += bd_a[i] * bd_b[j]
            bz[i + j] += ba[i] * bb[j]
            if h + i < la and h + j < lb:
                bz[i + j] += ba[h + i] * bb[h + j]
    lim = 1 << 31
    return all(v < lim for v in bm) and all(v < lim for v in bz)


def _conv(
    a: jax.Array, ba: Bounds, b: jax.Array, bb: Bounds
) -> tuple[jax.Array, Bounds]:
    if _compact_conv():
        return _conv_diag(a, ba, b, bb)
    if not _karatsuba_safe(ba, bb):
        return _conv_schoolbook(a, ba, b, bb)
    la = len(ba)
    h, bd_a, bd_b = _kara_halves(ba, bb)
    lo = la - h  # high-half length (h or h-1)

    def padh(x, l):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, h - l)])

    a0, a1 = a[..., :h], padh(a[..., h:], lo)
    b0, b1 = b[..., :h], padh(b[..., h:], lo)
    z0, _ = _conv(a0, ba[:h], b0, bb[:h])  # recurse (2-level and deeper)
    z2, _ = _conv(a[..., h:], ba[h:], b[..., h:], bb[h:])
    # m's inputs are SIGNED diffs: the magnitude-max bound tuples are not
    # valid for a further Karatsuba split (diff-of-diffs needs bound
    # SUMS), so m stays schoolbook at every level; bm < 2^31 was checked.
    m, _ = _conv_schoolbook(a0 - a1, bd_a, b0 - b1, bd_b)
    z2p = jnp.pad(z2, [(0, 0)] * (z2.ndim - 1) + [(0, (2 * h - 1) - (2 * lo - 1))])
    z1 = (z0 + z2p) - m  # exact non-negative middle conv
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    out = jnp.zeros(shape + (2 * la - 1,), dtype=jnp.int32)
    out = out.at[..., : 2 * h - 1].add(z0)
    out = out.at[..., h : h + 2 * h - 1].add(z1)
    out = out.at[..., 2 * h : 2 * h + 2 * lo - 1].add(z2)
    return out, _conv_bounds(ba, bb)


def _sqr_schoolbook(a: jax.Array, ba: Bounds) -> tuple[jax.Array, Bounds]:
    """conv(a, a) via the triangular formulation: ~la^2/2 products
    (2*a_i*a_j for i<j, plus the diagonal) instead of la^2. Valid for
    signed inputs (Karatsuba middle terms); positional bounds equal the
    schoolbook conv bounds (identical final values), and the doubled
    products |a_i * 2a_j| <= LOOSE * 2*LOOSE < 2^31."""
    la = len(ba)
    shape = a.shape[:-1]
    two_a = a * 2
    out = jnp.zeros(shape + (2 * la - 1,), dtype=jnp.int32)
    for j in range(1, la):
        out = out.at[..., j : 2 * j].add(a[..., :j] * two_a[..., j : j + 1])
    sq = a * a
    # diagonal lands at even positions: interleave with zeros (no scatter)
    diag = jnp.stack([sq, jnp.zeros_like(sq)], axis=-1).reshape(
        shape + (2 * la,)
    )[..., : 2 * la - 1]
    return out + diag, _conv_bounds(ba, ba)


def _conv_sqr(a: jax.Array, ba: Bounds) -> tuple[jax.Array, Bounds]:
    """Squaring convolution: Karatsuba where safe, all three half-size
    products squares themselves (z1 = z0 + z2 - (a0-a1)^2)."""
    if _compact_conv():
        return _conv_diag(a, ba, a, ba)  # compact path: lowest HLO count
    if not _karatsuba_safe(ba, ba):
        return _sqr_schoolbook(a, ba)
    la = len(ba)
    h, bd_a, _ = _kara_halves(ba, ba)
    lo = la - h

    def padh(x, l):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, h - l)])

    a0, a1 = a[..., :h], padh(a[..., h:], lo)
    z0, _ = _conv_sqr(a0, ba[:h])
    z2, _ = _conv_sqr(a[..., h:], ba[h:])
    m, _ = _sqr_schoolbook(a0 - a1, bd_a)  # signed diffs, still a square
    z2p = jnp.pad(z2, [(0, 0)] * (z2.ndim - 1) + [(0, (2 * h - 1) - (2 * lo - 1))])
    z1 = (z0 + z2p) - m
    out = jnp.zeros(a.shape[:-1] + (2 * la - 1,), dtype=jnp.int32)
    out = out.at[..., : 2 * h - 1].add(z0)
    out = out.at[..., h : h + 2 * h - 1].add(z1)
    out = out.at[..., 2 * h : 2 * h + 2 * lo - 1].add(z2)
    return out, _conv_bounds(ba, ba)


def _fold(
    spec: FieldSpec, x: jax.Array, bounds: Bounds
) -> tuple[jax.Array, Bounds]:
    """Fold limbs >= 20 down: x === lo + OFF - conv(hi, 64*t0) (mod p)."""
    assert len(bounds) > 20 and all(b <= LOOSE for b in bounds)
    lo, blo = x[..., :20], bounds[:20]
    hi, bhi = x[..., 20:], bounds[20:]
    fold_np, fold_b = _fold_const(spec)
    m, bm = _conv(hi, bhi, jnp.asarray(fold_np), fold_b)
    off_np, off_b = _spread_offset(spec, bm)
    nl = len(off_b)
    out = jnp.zeros(x.shape[:-1] + (nl,), dtype=jnp.int32)
    out = out.at[..., :20].add(lo)
    out = out + jnp.asarray(off_np)
    out = out.at[..., : len(bm)].add(-m)
    nb = tuple(
        (blo[i] if i < 20 else 0) + off_b[i] for i in range(nl)
    )  # m only subtracts; lower bound stays >= 0 by construction
    return out, nb


def _fold_mat(
    spec: FieldSpec, x: jax.Array, bounds: Bounds
) -> tuple[jax.Array, Bounds]:
    """One-shot fold of every limb >= 20 into 20 limbs via _fold_matrix:
    m = hi @ C, out = lo + m. Requires normalized input (<= LOOSE)."""
    assert all(b <= LOOSE for b in bounds)
    nhi = len(bounds) - 20
    lo, blo = x[..., :20], bounds[:20]
    hi, bhi = x[..., 20:], bounds[20:]
    mat, rows_b = _fold_matrix(spec, nhi)
    m = jnp.einsum(
        "...j,ji->...i", hi, jnp.asarray(mat), preferred_element_type=jnp.int32
    )
    nb = tuple(
        blo[i] + sum(bhi[j] * rows_b[j][i] for j in range(nhi))
        for i in range(20)
    )
    assert all(v < (1 << 31) for v in nb), "fold-matrix bound overflow"
    return lo + m, nb


def _reduce(
    spec: FieldSpec, x: jax.Array, bounds: Bounds
) -> tuple[jax.Array, Bounds]:
    """Bring any non-negative (array, bounds) into REP."""
    fold = _fold_mat if _fold_mode() == "matrix" else _fold
    x, bounds = _normalize(x, bounds)
    while len(bounds) > REP_LIMBS:
        x, bounds = fold(spec, x, bounds)
        x, bounds = _normalize(x, bounds)
    if len(bounds) < REP_LIMBS:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, REP_LIMBS - len(bounds))]
        x = jnp.pad(x, pad)
        bounds = bounds + (0,) * (REP_LIMBS - len(bounds))
    assert all(b <= LOOSE for b in bounds)
    return x, bounds


def _rep(spec: FieldSpec, x: jax.Array, bounds: Bounds) -> jax.Array:
    y, nb = _reduce(spec, x, bounds)
    return y


# ---------------------------------------------------------------------------
# Public ops (REP in, REP out)
# ---------------------------------------------------------------------------

def zeros(spec: FieldSpec, shape: tuple[int, ...] = ()) -> jax.Array:
    return jnp.zeros(shape + (REP_LIMBS,), dtype=jnp.int32)


def ones(spec: FieldSpec, shape: tuple[int, ...] = ()) -> jax.Array:
    return zeros(spec, shape).at[..., 0].set(1)


def from_canon(x: jax.Array) -> jax.Array:
    """Canonical 20-limb (ff.py) -> REP."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, REP_LIMBS - x.shape[-1])]
    return jnp.pad(x, pad)


def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return _rep(spec, a + b, tuple(2 * v for v in REP_BOUNDS))


def mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    t, bt = _conv(a, REP_BOUNDS, b, REP_BOUNDS)
    return _rep(spec, t, bt)


def square(spec: FieldSpec, a: jax.Array) -> jax.Array:
    """a^2 via the triangular convolution (~half the limb products of
    mul(a, a)); hot in Fermat inversion / pow_const (254 squarings),
    the poseidon sbox and zeta^n chains."""
    t, bt = _conv_sqr(a, REP_BOUNDS)
    return _rep(spec, t, bt)


def mul_small(spec: FieldSpec, a: jax.Array, c: int) -> jax.Array:
    """Multiply by a small non-negative compile-time constant (< 2^17)."""
    assert 0 <= c < (1 << 17)
    return _rep(spec, a * c, tuple(v * c for v in REP_BOUNDS))


@functools.cache
def _sub_offset(spec: FieldSpec) -> tuple[np.ndarray, Bounds]:
    return _spread_offset(spec, REP_BOUNDS)


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    """a - b via a + (OFF - b) with OFF a spread multiple of p >= b limbwise."""
    off_np, off_b = _sub_offset(spec)
    nl = len(off_b)
    x = jnp.zeros(
        jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (nl,),
        dtype=jnp.int32,
    )
    x = x + jnp.asarray(off_np)
    x = x.at[..., :REP_LIMBS].add(a - b)
    bounds = tuple(
        off_b[i] + (REP_BOUNDS[i] if i < REP_LIMBS else 0) for i in range(nl)
    )
    return _rep(spec, x, bounds)


def neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return sub(spec, zeros(spec), a)


def _chain_kernel_mode() -> str:
    """auto (kernel on TPU for long chains) | on | off | interpret."""
    import os

    return os.environ.get("MINA_BRIDGE_TPU_CHAIN_KERNEL", "auto")


def pow_const(spec: FieldSpec, x: jax.Array, e: int) -> jax.Array:
    if e == 0:
        return jnp.broadcast_to(ones(spec), x.shape).astype(jnp.int32)
    # Long fixed-exponent ladders (Fermat inversion: ~254 sequential
    # square/mul steps) run as ONE Pallas kernel on TPU — the lax.scan
    # formulation's tiny fused ops are latency-bound on the transcript
    # critical path (see fields/chain_kernel.py).
    kmode = _chain_kernel_mode()
    if e.bit_length() >= 32 and (
        kmode in ("on", "interpret")
        or (kmode == "auto" and _chain_kernel().use_kernel())
    ):
        return _chain_kernel().pow_const_rows(
            spec, x, e, interpret=(kmode == "interpret")
        )
    bits = np.array(
        [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.int32
    )

    def body(acc, bit):
        acc = square(spec, acc)
        acc = jnp.where(bit, mul(spec, acc, x), acc)
        return acc, None

    acc, _ = jax.lax.scan(body, x, jnp.asarray(bits[1:]))
    return acc


@functools.cache
def _chain_kernel():
    from . import chain_kernel

    return chain_kernel


def inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Fermat inversion; inv of (anything === 0 mod p) is 0."""
    return pow_const(spec, x, spec.p - 2)


# ---------------------------------------------------------------------------
# Canonicalization boundary (exact; uses scans — not for hot loops)
# ---------------------------------------------------------------------------

def canon(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """REP (22 limbs) -> canonical 20-limb value in [0, p)."""
    y, carry_out = ffc.carry(x, REP_LIMBS + 1)
    # carry_out is provably 0: REP value < 2^273.4 < 2^(13*23)
    # q is exactly floor(value / 2^254): limbs below 254 bits contribute
    # strictly less than 2^254.
    q = (y[..., 19] >> 7) + (y[..., 20] << 6) + (y[..., 21] << 19)
    p20_np = int_to_limbs(spec.p, 20)
    p20 = jnp.asarray(p20_np)
    qlimbs = jnp.stack([q & LIMB_MASK, q >> LIMB_BITS], axis=-1)
    qp, _ = _conv(
        qlimbs, (LIMB_MASK, 1 << 7), p20, tuple(int(v) for v in p20_np)
    )
    # value - q*p = (value mod 2^254) - q*t0 can be slightly negative;
    # add one extra p so the remainder lands in (0, 2p).
    r = y.at[..., :20].add(p20) - jnp.pad(
        qp, [(0, 0)] * (qp.ndim - 1) + [(0, REP_LIMBS + 1 - qp.shape[-1])]
    )
    r, _ = ffc.carry(r, REP_LIMBS + 1)
    r = r[..., :20]  # value < 2p < 2^256: top limbs provably zero
    return ffc._cond_sub_p(r, spec)


def eq(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(canon(spec, a) == canon(spec, b), axis=-1)


def is_zero(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return jnp.all(canon(spec, a) == 0, axis=-1)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Host conversion
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, v: int) -> jax.Array:
    return jnp.asarray(int_to_limbs(v % spec.p, REP_LIMBS))


def from_ints(spec: FieldSpec, xs) -> jax.Array:
    arr = np.stack([int_to_limbs(int(v) % spec.p, REP_LIMBS) for v in xs])
    return jnp.asarray(arr)


def to_int(spec: FieldSpec, x) -> int:
    from .params import limbs_to_int

    return limbs_to_int(np.asarray(x)) % spec.p


def to_ints(spec: FieldSpec, x) -> list[int]:
    from .params import limbs_to_int

    a = np.asarray(x).reshape(-1, x.shape[-1])
    return [limbs_to_int(row) % spec.p for row in a]
