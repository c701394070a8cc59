"""Branch-free Pasta curve arithmetic for TPU: complete projective formulas.

Points are int32 arrays of shape (..., 3, ffl.REP_LIMBS) holding
homogeneous (X:Y:Z) coordinates in the *lazy redundant* field
representation (fields/ffl.py); the identity is (0:1:0). We use the
*complete* addition/doubling formulas of Renes-Costello-Batina 2016
(eprint 2015/1060, Algorithms 7 and 9, a=0): one straight-line program
valid for every input pair — doubling, identity, inverses — with zero
data-dependent branching. On TPU this is strictly better than translating
arkworks' branchy Jacobian code (the reference's `ark-ec`,
core/Cargo.toml:19-21): every lane does identical scan-free work, so
point adds vectorize perfectly across the batch axes used by the MSM and
the verifier.

Cost: add = 12 field muls + 2 small-constant muls; double = 6 + 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import ffl
from ..fields.params import NLIMBS
from .host import B_COEFF, CurveSpec, PALLAS, VESTA

B3 = 3 * B_COEFF  # 15

__all__ = [
    "PALLAS",
    "VESTA",
    "identity",
    "from_affine",
    "to_affine_ints",
    "from_affine_ints",
    "add",
    "double",
    "neg",
    "scalar_mul",
    "is_identity",
    "select",
    "on_curve",
    "canon_point",
]


def identity(c: CurveSpec, shape: tuple[int, ...] = ()) -> jax.Array:
    pt = ffl.zeros(c.base, shape + (3,))
    return pt.at[..., 1, 0].set(1)  # (0:1:0)


def from_affine(c: CurveSpec, x: jax.Array, y: jax.Array) -> jax.Array:
    z = jnp.zeros_like(x).at[..., 0].set(1)
    return jnp.stack([x, y, z], axis=-2)


def from_affine_ints(c: CurveSpec, pts) -> jax.Array:
    """Host affine points [(x, y) or None, ...] -> device REP batch."""
    xs, ys, zs = [], [], []
    for pt in pts:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(pt[0]), ys.append(pt[1]), zs.append(1)
    return jnp.stack(
        [
            ffl.from_ints(c.base, xs),
            ffl.from_ints(c.base, ys),
            ffl.from_ints(c.base, zs),
        ],
        axis=-2,
    )


def to_affine_ints(c: CurveSpec, pts) -> list:
    """Device REP batch -> host affine list (None for identity)."""
    import numpy as np

    from ..fields import host as fh

    arr = np.asarray(pts)
    arr = arr.reshape(-1, 3, arr.shape[-1])
    out = []
    p = c.base.p
    for row in arr:
        x, y, z = (ffl.to_int(c.base, row[i]) for i in range(3))
        if z == 0:
            out.append(None)
        else:
            zi = fh.finv(c.base, z)
            out.append((x * zi % p, y * zi % p))
    return out


def is_identity(c: CurveSpec, pt: jax.Array) -> jax.Array:
    """Boundary op (canonicalizes Z)."""
    return ffl.is_zero(c.base, pt[..., 2, :])


def neg(c: CurveSpec, pt: jax.Array) -> jax.Array:
    return pt.at[..., 1, :].set(ffl.neg(c.base, pt[..., 1, :]))


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask ? a : b over point arrays (mask broadcasts over (3, limbs))."""
    return jnp.where(mask[..., None, None], a, b)


def add(c: CurveSpec, p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete addition (RCB16 Algorithm 7, a=0, b3=15)."""
    f = c.base
    m = lambda u, v: ffl.mul(f, u, v)
    a_ = lambda u, v: ffl.add(f, u, v)
    s = lambda u, v: ffl.sub(f, u, v)
    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

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
    t2 = ffl.mul_small(f, t2, B3)
    z3 = a_(t1, t2)
    t1 = s(t1, t2)
    y3 = ffl.mul_small(f, y3, B3)
    x3 = m(t4, y3)
    t2 = m(t3, t1)
    x3 = s(t2, x3)
    y3 = m(y3, t0)
    t1 = m(t1, z3)
    y3 = a_(t1, y3)
    t0 = m(t0, t3)
    z3 = m(z3, t4)
    z3 = a_(z3, t0)
    return jnp.stack([x3, y3, z3], axis=-2)


def double(c: CurveSpec, p: jax.Array) -> jax.Array:
    """Exception-free doubling (RCB16 Algorithm 9, a=0, b3=15)."""
    f = c.base
    m = lambda u, v: ffl.mul(f, u, v)
    a_ = lambda u, v: ffl.add(f, u, v)
    s = lambda u, v: ffl.sub(f, u, v)
    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]

    t0 = ffl.square(f, y)
    z3 = a_(t0, t0)
    z3 = a_(z3, z3)
    z3 = a_(z3, z3)
    t1 = m(y, z)
    t2 = ffl.square(f, z)
    t2 = ffl.mul_small(f, t2, B3)
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
    return jnp.stack([x3, y3, z3], axis=-2)


def scalar_mul(c: CurveSpec, k_bits: jax.Array, p: jax.Array) -> jax.Array:
    """Left-to-right double-and-add over a bit array (msb first).

    k_bits: int32 (..., nbits) of 0/1; p: points broadcastable to the same
    batch. Constant work per lane (select instead of branch).
    """
    nbits = k_bits.shape[-1]
    acc = jnp.broadcast_to(identity(c), p.shape).astype(jnp.int32)

    def body(i, acc):
        acc = double(c, acc)
        added = add(c, acc, p)
        bit = k_bits[..., i]
        return select(bit.astype(bool), added, acc)

    return jax.lax.fori_loop(0, nbits, body, acc)


def canon_point(c: CurveSpec, pt: jax.Array) -> jax.Array:
    """Canonicalize each coordinate to [0, p) (still projective)."""
    out = ffl.canon(c.base, pt)
    pad = [(0, 0)] * (out.ndim - 1) + [(0, ffl.REP_LIMBS - NLIMBS)]
    return jnp.pad(out, pad)


def on_curve(c: CurveSpec, pt: jax.Array) -> jax.Array:
    """Projective curve membership: Y^2 Z == X^3 + b Z^3 (identity passes)."""
    f = c.base
    x, y, z = pt[..., 0, :], pt[..., 1, :], pt[..., 2, :]
    lhs = ffl.mul(f, ffl.mul(f, y, y), z)
    x3 = ffl.mul(f, ffl.mul(f, x, x), x)
    z3 = ffl.mul_small(f, ffl.mul(f, ffl.mul(f, z, z), z), B_COEFF)
    return ffl.eq(f, lhs, ffl.add(f, x3, z3))
