"""Lazy field arithmetic in limbs-first ("rows") layout: (..., L, B).

The Pallas-kernel twin of ffl.py: the limb axis is axis -2 (sublanes) and
the batch axis is last (lanes), so every limb operation is a full-width
VPU op when traced inside a Mosaic kernel — no HBM round-trips between
the ~1400 primitive ops of a modular multiply. The same functions run as
plain jnp on CPU (used as the fallback/test path).

Representation and bounds are identical to ffl.py (22 limbs, loose
[0, 8255], spread-offset folds); the static-bound helpers are shared.

Kernel-safety rules obeyed throughout: no captured array constants
(constant limb vectors enter as scalar literals via broadcast+concat) and
no scatter ops (shifted accumulations are pad+add).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import LIMB_BITS, LIMB_MASK, FieldSpec
from .ffl import (
    REP_LIMBS,
    LOOSE,
    REP_BOUNDS,
    Bounds,
    _conv_bounds,
    _fold_const,
    _fold_matrix,
    _fold_mode,
    _karatsuba_safe,
    _spread_offset,
    _sub_offset,
)

__all__ = [
    "conv_r",
    "mul_r",
    "add_r",
    "sub_r",
    "mul_small_r",
    "zeros_r",
    "ones_r",
]


def _shift_add(x: jax.Array, delta: jax.Array, start: int) -> jax.Array:
    """x[..., start:start+Ld, :] += delta, via pad+add (scatter-free)."""
    ld = delta.shape[-2]
    hi = x.shape[-2] - start - ld
    assert hi >= 0
    pad = [(0, 0)] * (delta.ndim - 2) + [(start, hi), (0, 0)]
    return x + jnp.pad(delta, pad)


def _const_rows(cvec, shape, dtype=jnp.int32) -> jax.Array:
    """Constant limb vector as broadcast+concat (no captured arrays)."""
    B = shape[-1]
    rows_ = [jnp.full(shape[:-2] + (1, B), int(v), dtype) for v in cvec]
    return jnp.concatenate(rows_, axis=-2)


def _carry_round_r(x: jax.Array, bounds: Bounds) -> tuple[jax.Array, Bounds]:
    c = x >> LIMB_BITS
    y = x & LIMB_MASK
    y = _shift_add(y, c[..., :-1, :], 1)
    nb = [min(b, LIMB_MASK) for b in bounds]
    for i in range(1, len(bounds)):
        nb[i] += bounds[i - 1] >> LIMB_BITS
    top_carry = bounds[-1] >> LIMB_BITS
    if top_carry > 0:
        y = jnp.concatenate([y, c[..., -1:, :]], axis=-2)
        nb.append(top_carry)
    return y, tuple(nb)


def _normalize_r(x, bounds, limit=LOOSE):
    while any(b > limit for b in bounds):
        x, bounds = _carry_round_r(x, bounds)
    return x, bounds


def _conv_schoolbook_r(a, ba: Bounds, b, bb: Bounds):
    la, lb = len(ba), len(bb)
    shape = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    B = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])[0]
    out = jnp.zeros(shape + (la + lb - 1, B), dtype=jnp.int32)
    if lb <= la:
        for j in range(lb):
            out = _shift_add(out, a * b[..., j : j + 1, :], j)
    else:
        for i in range(la):
            out = _shift_add(out, b * a[..., i : i + 1, :], i)
    return out, _conv_bounds(ba, bb)


def conv_r(a, ba: Bounds, b, bb: Bounds):
    la, lb = len(ba), len(bb)
    if not _karatsuba_safe(ba, bb):
        return _conv_schoolbook_r(a, ba, b, bb)
    from .ffl import _kara_halves

    h, bd_a, bd_b = _kara_halves(ba, bb)
    lo = la - h

    def padh(x, l):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, h - l), (0, 0)])

    a0, a1 = a[..., :h, :], padh(a[..., h:, :], lo)
    b0, b1 = b[..., :h, :], padh(b[..., h:, :], lo)
    z0, _ = conv_r(a0, ba[:h], b0, bb[:h])  # recurse
    z2, _ = conv_r(a[..., h:, :], ba[h:], b[..., h:, :], bb[h:])
    # m's inputs are SIGNED diffs: schoolbook at every level (see ffl)
    m, _ = _conv_schoolbook_r(a0 - a1, bd_a, b0 - b1, bd_b)
    z2p = jnp.pad(
        z2, [(0, 0)] * (z2.ndim - 2) + [(0, (2 * h - 1) - (2 * lo - 1)), (0, 0)]
    )
    z1 = (z0 + z2p) - m
    shape = jnp.broadcast_shapes(z0.shape[:-2], z1.shape[:-2])
    B = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])[0]
    out = jnp.zeros(shape + (la + lb - 1, B), dtype=jnp.int32)
    out = _shift_add(out, z0, 0)
    out = _shift_add(out, z1, h)
    out = _shift_add(out, z2, 2 * h)
    return out, _conv_bounds(ba, bb)


def _sqr_schoolbook_r(a, ba: Bounds):
    """Triangular squaring conv in rows layout (see ffl._sqr_schoolbook);
    scatter-free: shifted pad+adds plus an interleave for the diagonal."""
    la = len(ba)
    shape = a.shape[:-2]
    B = a.shape[-1]
    two_a = a * 2
    out = jnp.zeros(shape + (2 * la - 1, B), dtype=jnp.int32)
    for j in range(1, la):
        out = _shift_add(out, a[..., :j, :] * two_a[..., j : j + 1, :], j)
    sq = a * a
    diag = jnp.stack([sq, jnp.zeros_like(sq)], axis=-2).reshape(
        shape + (2 * la, B)
    )[..., : 2 * la - 1, :]
    return out + diag, _conv_bounds(ba, ba)


def conv_sqr_r(a, ba: Bounds):
    """conv(a, a) with ~half the products (rows twin of ffl._conv_sqr)."""
    if not _karatsuba_safe(ba, ba):
        return _sqr_schoolbook_r(a, ba)
    from .ffl import _kara_halves

    la = len(ba)
    h, bd_a, _ = _kara_halves(ba, ba)
    lo = la - h

    def padh(x, l):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, h - l), (0, 0)])

    a0, a1 = a[..., :h, :], padh(a[..., h:, :], lo)
    z0, _ = conv_sqr_r(a0, ba[:h])
    z2, _ = conv_sqr_r(a[..., h:, :], ba[h:])
    m, _ = _sqr_schoolbook_r(a0 - a1, bd_a)
    z2p = jnp.pad(
        z2, [(0, 0)] * (z2.ndim - 2) + [(0, (2 * h - 1) - (2 * lo - 1)), (0, 0)]
    )
    z1 = (z0 + z2p) - m
    B = a.shape[-1]
    out = jnp.zeros(a.shape[:-2] + (2 * la - 1, B), dtype=jnp.int32)
    out = _shift_add(out, z0, 0)
    out = _shift_add(out, z1, h)
    out = _shift_add(out, z2, 2 * h)
    return out, _conv_bounds(ba, ba)


def square_r(spec: FieldSpec, a):
    t, bt = conv_sqr_r(a, REP_BOUNDS)
    return _reduce_r(spec, t, bt)


def conv_const_r(a, ba: Bounds, cvec):
    """Convolve with a constant limb vector using scalar literals."""
    la, lc = len(ba), len(cvec)
    out = jnp.zeros(a.shape[:-2] + (la + lc - 1, a.shape[-1]), dtype=jnp.int32)
    for j, v in enumerate(cvec):
        if v:
            out = _shift_add(out, a * int(v), j)
    return out, _conv_bounds(ba, tuple(int(v) for v in cvec))


# --- one-shot matrix fold (rows twin of ffl._fold_mat) -------------------
#
# Inside a Mosaic kernel the (20, 31) fold matrix cannot be captured as
# an array constant (kernel-safety rule, see module docstring): the
# pallas_call wrappers pass it as an explicit kernel operand and push the
# traced ref value here via fold_ctx(). Outside kernels the jnp einsum
# path against the numpy constant is used directly.

FOLD_MAT_ROWS = 31  # int32-safe cap: 31 * LOOSE * 8191 < 2^31


@functools.cache
def fold_matrix_T(spec: FieldSpec) -> np.ndarray:
    """(20, FOLD_MAT_ROWS) transposed fold matrix (kernel operand form)."""
    mat, _ = _fold_matrix(spec, FOLD_MAT_ROWS)
    return np.ascontiguousarray(mat.T)


_fold_ctx_stack: list = []


@contextlib.contextmanager
def fold_ctx(cmat):
    """Provide the traced (20, >=nhi) fold-matrix value while tracing a
    kernel body (column j = canonical limbs of 2^(13*(20+j)) mod p)."""
    _fold_ctx_stack.append(cmat)
    try:
        yield
    finally:
        _fold_ctx_stack.pop()


def _fold_mat_r(spec: FieldSpec, x, bounds: Bounds):
    assert all(b <= LOOSE for b in bounds)
    nhi = len(bounds) - 20
    lo, blo = x[..., :20, :], bounds[:20]
    hi, bhi = x[..., 20:, :], bounds[20:]
    mat, rows_b = _fold_matrix(spec, nhi)
    if _fold_ctx_stack:
        cmat = _fold_ctx_stack[-1]
        m = jnp.zeros(x.shape[:-2] + (20, x.shape[-1]), jnp.int32)
        for j in range(nhi):
            m = m + hi[..., j : j + 1, :] * cmat[:, j : j + 1]
    else:
        m = jnp.einsum(
            "...jb,ji->...ib",
            hi,
            jnp.asarray(mat),
            preferred_element_type=jnp.int32,
        )
    nb = tuple(
        blo[i] + sum(bhi[j] * rows_b[j][i] for j in range(nhi))
        for i in range(20)
    )
    assert all(v < (1 << 31) for v in nb), "fold-matrix bound overflow"
    return lo + m, nb


def _fold_r(spec: FieldSpec, x, bounds: Bounds):
    lo, blo = x[..., :20, :], bounds[:20]
    hi, bhi = x[..., 20:, :], bounds[20:]
    fold_np, _fold_b = _fold_const(spec)
    m, bm = conv_const_r(hi, bhi, [int(v) for v in fold_np])
    off_np, off_b = _spread_offset(spec, bm)
    nl = len(off_b)
    out = _const_rows(off_np, x.shape[:-2] + (nl, x.shape[-1]))
    out = _shift_add(out, lo, 0)
    out = _shift_add(out, -m, 0)
    nb = tuple((blo[i] if i < 20 else 0) + off_b[i] for i in range(nl))
    return out, nb


def _reduce_r(spec: FieldSpec, x, bounds: Bounds):
    fold = _fold_mat_r if _fold_mode() == "matrix" else _fold_r
    x, bounds = _normalize_r(x, bounds)
    while len(bounds) > REP_LIMBS:
        x, bounds = fold(spec, x, bounds)
        x, bounds = _normalize_r(x, bounds)
    if len(bounds) < REP_LIMBS:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, REP_LIMBS - len(bounds)), (0, 0)]
        x = jnp.pad(x, pad)
    return x


def mul_r(spec: FieldSpec, a, b):
    t, bt = conv_r(a, REP_BOUNDS, b, REP_BOUNDS)
    return _reduce_r(spec, t, bt)


def add_r(spec: FieldSpec, a, b):
    return _reduce_r(spec, a + b, tuple(2 * v for v in REP_BOUNDS))


def sub_r(spec: FieldSpec, a, b):
    off_np, off_b = _sub_offset(spec)
    nl = len(off_b)
    shp = jnp.broadcast_shapes(a.shape, b.shape)
    x = _const_rows(off_np, shp[:-2] + (nl, shp[-1]))
    x = _shift_add(x, a - b, 0)
    bounds = tuple(
        off_b[i] + (2 * LOOSE if i < REP_LIMBS else 0) for i in range(nl)
    )
    return _reduce_r(spec, x, bounds)


def mul_small_r(spec: FieldSpec, a, c: int):
    assert 0 <= c < (1 << 17)
    return _reduce_r(spec, a * c, tuple(v * c for v in REP_BOUNDS))


def zeros_r(spec: FieldSpec, shape) -> jax.Array:
    return jnp.zeros(shape, dtype=jnp.int32)


def ones_r(spec: FieldSpec, shape) -> jax.Array:
    one = jnp.full(shape[:-2] + (1, shape[-1]), 1, jnp.int32)
    rest = jnp.zeros(shape[:-2] + (shape[-2] - 1, shape[-1]), jnp.int32)
    return jnp.concatenate([one, rest], axis=-2)
