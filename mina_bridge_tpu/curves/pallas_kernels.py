"""Fused Pallas TPU kernels for curve arithmetic (limbs-first layout).

The hot path of the MSM and verifier: one kernel invocation performs a
complete RCB point add (12 muls + 2 small-const muls + 19 add/sub, about
1400 primitive integer ops) entirely in VMEM — versus the op-granular XLA
path which round-trips HBM per primitive (measured ~100x slower).

Layout: a point batch is (3, REP_LIMBS, N) int32 — coordinates, limbs on
sublanes, batch on lanes. `to_rows`/`from_rows` convert from the
(N, 3, REP_LIMBS) layout used by the jnp reference path.

Each kernel is also runnable as plain jnp (CPU fallback / tests) since
the body is written with rows.py ops; `use_pallas()` picks the path.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import rows
from ..fields.ffl import REP_LIMBS, _fold_mode
from .host import B_COEFF, CurveSpec

B3 = 3 * B_COEFF
BLOCK = 1024  # lanes per kernel block


def use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


def to_rows(pts: jax.Array) -> jax.Array:
    """(N, 3, L) -> (3, L, N)."""
    return jnp.transpose(pts, (1, 2, 0))


def from_rows(rows_pts: jax.Array) -> jax.Array:
    """(3, L, N) -> (N, 3, L)."""
    return jnp.transpose(rows_pts, (2, 0, 1))


# ---------------------------------------------------------------------------
# Kernel bodies (pure functions of (3, L, B) values)
# ---------------------------------------------------------------------------

def padd_rows(c: CurveSpec, p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete addition (RCB16 Alg 7, a=0) on rows values."""
    f = c.base
    m = lambda u, v: rows.mul_r(f, u, v)
    a_ = lambda u, v: rows.add_r(f, u, v)
    s = lambda u, v: rows.sub_r(f, u, v)
    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2, z2 = q[0], q[1], q[2]

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t2 = m(z1, z2)
    t3 = a_(x1, y1)
    t4 = a_(x2, y2)
    t3 = m(t3, t4)
    t4 = a_(t0, t1)
    t3 = s(t3, t4)
    t4 = a_(y1, z1)
    x3 = a_(y2, z2)
    t4 = m(t4, x3)
    x3 = a_(t1, t2)
    t4 = s(t4, x3)
    x3 = a_(x1, z1)
    y3 = a_(x2, z2)
    x3 = m(x3, y3)
    y3 = a_(t0, t2)
    y3 = s(x3, y3)
    x3 = a_(t0, t0)
    t0 = a_(x3, t0)
    t2 = rows.mul_small_r(f, t2, B3)
    z3 = a_(t1, t2)
    t1 = s(t1, t2)
    y3 = rows.mul_small_r(f, y3, B3)
    x3 = m(t4, y3)
    t2 = m(t3, t1)
    x3 = s(t2, x3)
    y3 = m(y3, t0)
    t1 = m(t1, z3)
    y3 = a_(t1, y3)
    t0 = m(t0, t3)
    z3 = m(z3, t4)
    z3 = a_(z3, t0)
    return jnp.stack([x3, y3, z3], axis=0)


def pdouble_rows(c: CurveSpec, p: jax.Array) -> jax.Array:
    """Exception-free doubling (RCB16 Alg 9, a=0) on rows values."""
    f = c.base
    m = lambda u, v: rows.mul_r(f, u, v)
    a_ = lambda u, v: rows.add_r(f, u, v)
    s = lambda u, v: rows.sub_r(f, u, v)
    x, y, z = p[0], p[1], p[2]

    # NOTE: rows.square_r is deliberately NOT used here: the pdouble win
    # is negligible (doubles are ~250 single-lane Horner steps per MSM)
    # and keeping the kernel on plain muls holds its Mosaic/XLA graph at
    # the long-validated shape. ffl.square carries the squaring win on
    # the transcript-side paths where it matters.
    t0 = m(y, y)
    z3 = a_(t0, t0)
    z3 = a_(z3, z3)
    z3 = a_(z3, z3)
    t1 = m(y, z)
    t2 = m(z, z)
    t2 = rows.mul_small_r(f, t2, B3)
    x3 = m(t2, z3)
    y3 = a_(t0, t2)
    z3 = m(t1, z3)
    t1 = a_(t2, t2)
    t2 = a_(t1, t2)
    t0 = s(t0, t2)
    y3 = m(t0, y3)
    y3 = a_(x3, y3)
    t1 = m(x, y)
    x3 = m(t0, t1)
    x3 = a_(x3, x3)
    return jnp.stack([x3, y3, z3], axis=0)


def padd_select_rows(c, p, q, keep_q_mask):
    """where(mask, q, p + q) — the segmented-scan combine, fused."""
    added = padd_rows(c, p, q)
    return jnp.where(keep_q_mask[None, None, :] != 0, q, added)


def padd_mixed_rows(c: CurveSpec, p: jax.Array, q: jax.Array) -> jax.Array:
    """Mixed addition (RCB16 Alg 8, a=0): p projective + q with Z2 == 1.

    11 muls + 2 small-const muls + 13 add/sub (vs 12 + 2 + 19 for the
    full add) — the bucket-accumulation scan's q operands are always
    affine inputs (SRS / decoded commitments), so the scan rides this.
    Complete for every p including the identity; INVALID if q is the
    identity — callers mask that case (padd_mixed_select_rows)."""
    f = c.base
    m = lambda u, v: rows.mul_r(f, u, v)
    a_ = lambda u, v: rows.add_r(f, u, v)
    s = lambda u, v: rows.sub_r(f, u, v)
    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2 = q[0], q[1]

    t0 = m(x1, x2)
    t1 = m(y1, y2)
    t3 = a_(x2, y2)
    t4 = a_(x1, y1)
    t3 = m(t3, t4)
    t4 = a_(t0, t1)
    t3 = s(t3, t4)
    t4 = m(y2, z1)
    t4 = a_(t4, y1)
    y3 = m(x2, z1)
    y3 = a_(y3, x1)
    x3 = a_(t0, t0)
    t0 = a_(x3, t0)
    t2 = rows.mul_small_r(f, z1, B3)
    z3 = a_(t1, t2)
    t1 = s(t1, t2)
    y3 = rows.mul_small_r(f, y3, B3)
    x3 = m(t4, y3)
    t2 = m(t3, t1)
    x3 = s(t2, x3)
    y3 = m(y3, t0)
    t1 = m(t1, z3)
    y3 = a_(t1, y3)
    t0 = m(t0, t3)
    z3 = m(z3, t4)
    z3 = a_(z3, t0)
    return jnp.stack([x3, y3, z3], axis=0)


def padd_mixed_select_rows(c, p, q, keep_q_mask, q_inf_mask):
    """Segmented-scan combine on mixed adds:
    keep_q ? q : (q_inf ? p : p +mixed q). q's Z row must be exactly 0
    (identity) or 1 (affine) — true for every aff_to_rep / SRS point."""
    added = padd_mixed_rows(c, p, q)
    res = jnp.where(q_inf_mask[None, None, :] != 0, p, added)
    return jnp.where(keep_q_mask[None, None, :] != 0, q, res)


def padd_mixed_select2_rows(c, p, q2, keep_q_mask, q_inf_mask):
    """padd_mixed_select_rows with a 2-ROW q operand (x, y only): the
    mixed-add formulas never read q's Z, and its implicit value is
    (1 - q_inf) (affine point or identity), synthesized here for the
    keep-q branch. Carrying 2 rows instead of 3 through the sorted point
    stream cuts a third of the MSM bucket phase's HBM traffic."""
    added = padd_mixed_rows(c, p, q2)
    res = jnp.where(q_inf_mask[None, None, :] != 0, p, added)
    qz0 = (1 - q_inf_mask.astype(jnp.int32))[None, :]
    qz = jnp.concatenate(
        [qz0, jnp.zeros((q2.shape[1] - 1, q2.shape[2]), jnp.int32)], axis=0
    )
    qproj = jnp.concatenate([q2, qz[None]], axis=0)
    return jnp.where(keep_q_mask[None, None, :] != 0, qproj, res)


# ---------------------------------------------------------------------------
# pallas_call wrappers (grid over the lane axis)
# ---------------------------------------------------------------------------

def _point_spec(nrows: int = 3):
    return pl.BlockSpec(
        (nrows, REP_LIMBS, BLOCK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )


def _mask_spec():
    return pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.VMEM)


def _cmat_spec():
    return pl.BlockSpec(
        (20, rows.FOLD_MAT_ROWS), lambda i: (0, 0), memory_space=pltpu.VMEM
    )


def _pad_lanes(x: jax.Array, n: int) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
    return jnp.pad(x, pad) if n != x.shape[-1] else x


def _pallas_apply(c: CurveSpec, body, pts, masks, npad):
    """Run `body(*pts, *masks) -> (3, L, BLOCK)` as a gridded kernel.

    In matrix-fold mode the (20, 31) fold matrix rides as an explicit
    kernel operand (Mosaic kernels must not capture array constants) and
    is pushed to rows.fold_ctx for the duration of the body trace."""
    use_mat = _fold_mode() == "matrix"
    cmat_in = (jnp.asarray(rows.fold_matrix_T(c.base)),) if use_mat else ()
    np_, nm = len(pts), len(masks)

    def kernel(*refs):
        o_ref = refs[-1]
        off = 1 if use_mat else 0
        prefs = refs[off : off + np_]
        mrefs = refs[off + np_ : off + np_ + nm]
        ctx = (
            rows.fold_ctx(refs[0][:]) if use_mat else contextlib.nullcontext()
        )
        with ctx:
            o_ref[:] = body(*(r[:] for r in prefs), *(r[:] for r in mrefs))

    in_specs = (
        ([_cmat_spec()] if use_mat else [])
        + [_point_spec(p.shape[0]) for p in pts]  # 3-row proj or 2-row affine
        + [_mask_spec()] * nm
    )
    return pl.pallas_call(
        kernel,
        grid=(npad // BLOCK,),
        in_specs=in_specs,
        out_specs=_point_spec(),
        out_shape=jax.ShapeDtypeStruct((3, REP_LIMBS, npad), jnp.int32),
    )(*cmat_in, *pts, *masks)


@functools.partial(jax.jit, static_argnums=0)
def padd(c: CurveSpec, p: jax.Array, q: jax.Array) -> jax.Array:
    """Batched complete add on rows layout (3, L, N)."""
    n = p.shape[-1]
    if not use_pallas():
        return padd_rows(c, p, q)
    npad = -(-n // BLOCK) * BLOCK
    p2, q2 = _pad_lanes(p, npad), _pad_lanes(q, npad)
    out = _pallas_apply(
        c, lambda pv, qv: padd_rows(c, pv, qv), (p2, q2), (), npad
    )
    return out[..., :n]


@functools.partial(jax.jit, static_argnums=0)
def pdouble(c: CurveSpec, p: jax.Array) -> jax.Array:
    n = p.shape[-1]
    if not use_pallas():
        return pdouble_rows(c, p)
    npad = -(-n // BLOCK) * BLOCK
    p2 = _pad_lanes(p, npad)
    out = _pallas_apply(c, lambda pv: pdouble_rows(c, pv), (p2,), (), npad)
    return out[..., :n]


@functools.partial(jax.jit, static_argnums=0)
def padd_select(c: CurveSpec, p, q, keep_q_mask):
    """Fused segmented-combine: where(mask, q, p+q); mask int32 (N,)."""
    n = p.shape[-1]
    if not use_pallas():
        return padd_select_rows(c, p, q, keep_q_mask)
    npad = -(-n // BLOCK) * BLOCK
    p2, q2 = _pad_lanes(p, npad), _pad_lanes(q, npad)
    m2 = _pad_lanes(keep_q_mask.astype(jnp.int32), npad)
    out = _pallas_apply(
        c,
        lambda pv, qv, mv: padd_select_rows(c, pv, qv, mv),
        (p2, q2),
        (m2,),
        npad,
    )
    return out[..., :n]


@functools.partial(jax.jit, static_argnums=0)
def padd_mixed_select(c: CurveSpec, p, q, keep_q_mask, q_inf_mask):
    """Fused mixed-add segmented combine (see padd_mixed_select_rows)."""
    n = p.shape[-1]
    if not use_pallas():
        return padd_mixed_select_rows(c, p, q, keep_q_mask, q_inf_mask)
    npad = -(-n // BLOCK) * BLOCK
    p2, q2 = _pad_lanes(p, npad), _pad_lanes(q, npad)
    m2 = _pad_lanes(keep_q_mask.astype(jnp.int32), npad)
    # padded lanes must not take the mixed-add path on zeroed q operands
    i2 = _pad_lanes(q_inf_mask.astype(jnp.int32), npad)
    if npad != n:
        lane = jnp.arange(npad, dtype=jnp.int32)
        i2 = jnp.where(lane >= n, 1, i2)
    out = _pallas_apply(
        c,
        lambda pv, qv, mv, iv: padd_mixed_select_rows(c, pv, qv, mv, iv),
        (p2, q2),
        (m2, i2),
        npad,
    )
    return out[..., :n]


@functools.partial(jax.jit, static_argnums=0)
def padd_mixed_select2(c: CurveSpec, p, q2, keep_q_mask, q_inf_mask):
    """Fused mixed-add segmented combine with a 2-row (x, y) q operand
    (see padd_mixed_select2_rows)."""
    n = p.shape[-1]
    if not use_pallas():
        return padd_mixed_select2_rows(c, p, q2, keep_q_mask, q_inf_mask)
    npad = -(-n // BLOCK) * BLOCK
    p2, q2p = _pad_lanes(p, npad), _pad_lanes(q2, npad)
    m2 = _pad_lanes(keep_q_mask.astype(jnp.int32), npad)
    # padded lanes must not take the mixed-add path on zeroed q operands
    i2 = _pad_lanes(q_inf_mask.astype(jnp.int32), npad)
    if npad != n:
        lane = jnp.arange(npad, dtype=jnp.int32)
        i2 = jnp.where(lane >= n, 1, i2)
    out = _pallas_apply(
        c,
        lambda pv, qv, mv, iv: padd_mixed_select2_rows(c, pv, qv, mv, iv),
        (p2, q2p),
        (m2, i2),
        npad,
    )
    return out[..., :n]
