"""Vectorized Pasta field arithmetic on TPU-friendly int32 limb arrays.

A field element is an int32 array whose trailing axis holds NLIMBS=20
little-endian 13-bit limbs; any leading axes are batch. All ops are pure
jnp programs (jit/vmap/shard_map-compatible, no data-dependent shapes).

Why 13-bit limbs: TPUs have no 64-bit integer multiply. 13x13-bit limb
products (< 2^26) accumulate exactly in int32 across a 20-term schoolbook
convolution (< 2^30.4). Reduction exploits the Pasta prime shape
p = 2^254 + t0 (t0 < 2^126): 2^260 === -64*t0 (mod p), so a 510-bit
product is folded twice by the 11-limb constant 64*t0, then finished with
a 1-limb estimated quotient. Negative intermediates are avoided by adding
aligned multiples of p before each fold, keeping every carry chain on
non-negative values except the final conditional subtract.

This replaces the reference's Rust/asm `ark-ff` Montgomery arithmetic
(reference core/Cargo.toml:44-49); we deliberately use the standard (not
Montgomery) representation: fold-reduction costs about the same on VPU
lanes and keeps values bit-identical to the canonical encoding used by
serialization and the Poseidon sponge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .params import (
    FP,
    FQ,
    LIMB_BITS,
    LIMB_MASK,
    NLIMBS,
    FieldSpec,
    int_to_limbs,
    limbs_to_int,
)

__all__ = [
    "FP",
    "FQ",
    "NLIMBS",
    "add",
    "sub",
    "neg",
    "mul",
    "square",
    "mul_const",
    "pow_const",
    "inv",
    "batch_inv",
    "is_zero",
    "eq",
    "select",
    "zeros",
    "ones",
    "from_int",
    "to_int",
    "from_ints",
    "to_ints",
]


# ---------------------------------------------------------------------------
# Carry propagation
# ---------------------------------------------------------------------------

def carry(x: jax.Array, out_len: int) -> tuple[jax.Array, jax.Array]:
    """Exact carry propagation along the trailing limb axis.

    Input limbs may be any int32 values with |v| < 2^30. Returns
    ``(limbs, carry_out)`` with limbs in [0, 2^13) such that
    value(input) == value(limbs) + carry_out * 2^(13*out_len).
    """
    n = x.shape[-1]
    if n < out_len:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, out_len - n)]
        x = jnp.pad(x, pad)
    elif n > out_len:
        raise ValueError(f"carry: input {n} limbs > out_len {out_len}")

    xt = jnp.moveaxis(x, -1, 0)  # (L, ...batch)
    c0 = jnp.zeros(xt.shape[1:], dtype=jnp.int32)

    def body(c, limb):
        total = limb + c
        return total >> LIMB_BITS, total & LIMB_MASK

    c_out, limbs = jax.lax.scan(body, c0, xt)
    return jnp.moveaxis(limbs, 0, -1), c_out


def _carry0(x: jax.Array, out_len: int) -> jax.Array:
    """Carry propagation where the carry-out is statically known to be 0."""
    limbs, _ = carry(x, out_len)
    return limbs


# ---------------------------------------------------------------------------
# Limb convolution (schoolbook multiply, no reduction)
# ---------------------------------------------------------------------------

def conv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Polynomial (base-2^13) product of limb vectors: out has la+lb-1 limbs.

    Requires all input limbs in [0, 2^13) so int32 accumulation is exact.
    """
    la, lb = a.shape[-1], b.shape[-1]
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    out = jnp.zeros(shape + (la + lb - 1,), dtype=jnp.int32)
    # Unrolled over the shorter operand: each step is one vector multiply-add.
    if lb <= la:
        for j in range(lb):
            out = out.at[..., j : j + la].add(a * b[..., j : j + 1])
    else:
        for i in range(la):
            out = out.at[..., i : i + lb].add(b * a[..., i : i + 1])
    return out


def _np_limbs(x: int, n: int | None = None) -> np.ndarray:
    if n is None:
        n = max(1, -(-x.bit_length() // LIMB_BITS))
    return int_to_limbs(x, n)


@functools.cache
def _reduce_consts(spec: FieldSpec):
    """Precomputed numpy limb constants for the fold-reduction pipeline."""
    fold = _np_limbs(spec.fold_c)  # 11 limbs
    # Offset added before fold 1: smallest 2^k * p exceeding max fold-1
    # subtrahend conv(hi<2^250, fold<2^132) < 2^382  ->  2^128 * p.
    off1 = _np_limbs(spec.p << 128, 30)
    # Offset before fold 2: subtrahend < 2^255 -> 4p > 2^256.
    off2 = _np_limbs(4 * spec.p, 20)
    p_limbs = _np_limbs(spec.p, NLIMBS)
    return fold, off1, off2, p_limbs


def _reduce_product(t: jax.Array, spec: FieldSpec) -> jax.Array:
    """Reduce a <=40-limb normalized (limbs in [0,2^13)) value to [0, p)."""
    fold, off1, off2, p_limbs = _reduce_consts(spec)
    fold = jnp.asarray(fold)
    t = _carry0(t, 40)
    lo, hi = t[..., :NLIMBS], t[..., NLIMBS:]

    # Fold 1: value === lo + 2^128*p - hi * (64 t0)   (all terms >= 0)
    r1 = jnp.zeros(t.shape[:-1] + (30,), dtype=jnp.int32)
    r1 = r1.at[..., :NLIMBS].add(lo)
    r1 = r1 + jnp.asarray(off1)
    r1 = r1 - conv(hi, fold)
    r1 = _carry0(r1, 30)  # < 2^383

    # Fold 2: same trick on the 10 limbs above 2^260.
    lo2, hi2 = r1[..., :NLIMBS], r1[..., NLIMBS:]
    r2 = jnp.zeros(t.shape[:-1] + (21,), dtype=jnp.int32)
    r2 = r2.at[..., :NLIMBS].add(lo2 + jnp.asarray(off2))
    r2 = r2.at[..., : 10 + fold.shape[0] - 1].add(-conv(hi2, fold))
    r2 = _carry0(r2, 21)  # < 2^261

    # Estimated quotient q = r2 >> 254 (fits one limb, q <= 162).
    q = (r2[..., 19] >> 7) + (r2[..., 20] << 6)
    # r3 = r2 - q*p in (-2^134, 2^254); +p makes it positive and < 2^255.
    r3 = r2.at[..., :NLIMBS].add(
        jnp.asarray(p_limbs) - q[..., None] * jnp.asarray(p_limbs)
    )
    r4 = _carry0(r3, 21)
    # value < 2^255 so the normalized top limb is provably zero: drop it.
    r4 = r4[..., :NLIMBS]
    return _cond_sub_p(r4, spec)


def _cond_sub_p(x: jax.Array, spec: FieldSpec) -> jax.Array:
    """x in [0, 2p) with normalized limbs -> x mod p."""
    _, _, _, p_limbs = _reduce_consts(spec)
    d, borrow = carry(x - jnp.asarray(p_limbs), NLIMBS)
    return jnp.where((borrow < 0)[..., None], x, d)


# ---------------------------------------------------------------------------
# Public field ops
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return _cond_sub_p(_carry0(a + b, NLIMBS), spec)


def sub(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    _, _, _, p_limbs = _reduce_consts(spec)
    return _cond_sub_p(_carry0(a - b + jnp.asarray(p_limbs), NLIMBS), spec)


def neg(spec: FieldSpec, a: jax.Array) -> jax.Array:
    _, _, _, p_limbs = _reduce_consts(spec)
    return _cond_sub_p(_carry0(jnp.asarray(p_limbs) - a, NLIMBS), spec)


def mul(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return _reduce_product(conv(a, b), spec)


def square(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return mul(spec, a, a)


@functools.cache
def _const_limbs(spec: FieldSpec, c: int) -> np.ndarray:
    return _np_limbs(c % spec.p, NLIMBS)


def mul_const(spec: FieldSpec, a: jax.Array, c: int) -> jax.Array:
    """Multiply by a compile-time integer constant."""
    return mul(spec, a, jnp.asarray(_const_limbs(spec, c)))


def pow_const(spec: FieldSpec, x: jax.Array, e: int) -> jax.Array:
    """x**e for a compile-time exponent, via scan over the exponent bits."""
    if e == 0:
        return jnp.broadcast_to(ones(spec), x.shape).astype(jnp.int32)
    bits = np.array(
        [(e >> i) & 1 for i in reversed(range(e.bit_length()))], dtype=np.int32
    )

    def body(acc, bit):
        acc = mul(spec, acc, acc)
        acc = jnp.where(bit, mul(spec, acc, x), acc)
        return acc, None

    # First bit is always 1: start from x, consume remaining bits.
    acc, _ = jax.lax.scan(body, x, jnp.asarray(bits[1:]))
    return acc


def inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Fermat inversion x^(p-2); inv(0) == 0."""
    return pow_const(spec, x, spec.p - 2)


def batch_inv(spec: FieldSpec, x: jax.Array) -> jax.Array:
    """Montgomery batched inversion along the leading axis.

    One field inversion + 3(n-1) multiplications for n elements. Zero
    elements invert to zero (matching arkworks' batch_inversion behavior).
    """
    zero_mask = is_zero(spec, x)
    safe = jnp.where(zero_mask[..., None], ones(spec), x)

    def fwd(acc, xi):
        nxt = mul(spec, acc, xi)
        return nxt, acc  # emit prefix product excluding xi

    total, prefixes = jax.lax.scan(fwd, ones_like(spec, x[0]), safe)
    total_inv = inv(spec, total)

    def bwd(acc, inp):
        xi, prefix = inp
        out = mul(spec, acc, prefix)  # = 1/xi
        acc = mul(spec, acc, xi)  # strip xi from suffix accumulator
        return acc, out

    _, invs = jax.lax.scan(bwd, total_inv, (safe, prefixes), reverse=True)
    return jnp.where(zero_mask[..., None], jnp.zeros_like(x), invs)


def is_zero(spec: FieldSpec, a: jax.Array) -> jax.Array:
    return jnp.all(a == 0, axis=-1)


def eq(spec: FieldSpec, a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.all(a == b, axis=-1)


def select(mask: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """mask ? a : b, broadcasting mask over the limb axis."""
    return jnp.where(mask[..., None], a, b)


def zeros(spec: FieldSpec, shape: tuple[int, ...] = ()) -> jax.Array:
    return jnp.zeros(shape + (NLIMBS,), dtype=jnp.int32)


def ones(spec: FieldSpec, shape: tuple[int, ...] = ()) -> jax.Array:
    return jnp.zeros(shape + (NLIMBS,), dtype=jnp.int32).at[..., 0].set(1)


def ones_like(spec: FieldSpec, x: jax.Array) -> jax.Array:
    return jnp.zeros_like(x).at[..., 0].set(1)


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------

def from_int(spec: FieldSpec, x: int) -> jax.Array:
    return jnp.asarray(int_to_limbs(x % spec.p, NLIMBS))


def from_ints(spec: FieldSpec, xs) -> jax.Array:
    arr = np.stack([int_to_limbs(int(x) % spec.p, NLIMBS) for x in xs])
    return jnp.asarray(arr)


def to_int(x) -> int:
    return limbs_to_int(np.asarray(x))


def to_ints(x) -> list[int]:
    a = np.asarray(x).reshape(-1, NLIMBS)
    return [limbs_to_int(row) for row in a]
