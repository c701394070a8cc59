"""Host reference implementation of the Pasta curves (Pallas/Vesta).

Affine arithmetic with explicit infinity, scalar multiplication, point
compression/decompression. The oracle for the device projective kernels
and the engine for SRS loading / fixture generation. Replaces what the
reference gets from `mina-curves`/`ark-ec` (core/Cargo.toml:19-21).

Both curves: y^2 = x^3 + 5, generator (-1, 2), cofactor 1.
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields import host as fh
from ..fields.params import FP, FQ, FieldSpec

B_COEFF = 5


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    base: FieldSpec  # coordinate field
    scalar: FieldSpec  # group order field

    @property
    def b(self) -> int:
        return B_COEFF

    @functools.cached_property
    def generator(self) -> tuple[int, int]:
        return (self.base.p - 1, 2)  # (-1, 2)

    @functools.cached_property
    def endo_base(self) -> int:
        """Cube root of unity zeta in the base field: phi(x,y)=(zeta*x, y).

        Chosen as g^((p-1)/3) for the field's least multiplicative
        generator g (matching arkworks' generator convention for Pasta,
        g = 5). Drives the endomul scalar decomposition.
        """
        g = _least_generator(self.base)
        return pow(g, (self.base.p - 1) // 3, self.base.p)

    @functools.cached_property
    def endo_scalar(self) -> int:
        """The cube root lambda in the scalar field MATCHING endo_base:
        phi(P) = (endo_base * x, y) = [endo_scalar] P (checked on the
        generator; g^((p-1)/3) alone can yield the conjugate root)."""
        g = _least_generator(self.scalar)
        lam = pow(g, (self.scalar.p - 1) // 3, self.scalar.p)
        gen = self.generator
        phi = (self.endo_base * gen[0] % self.base.p, gen[1])
        if jmul(self, lam, gen) == phi:
            return lam
        lam2 = lam * lam % self.scalar.p
        assert jmul(self, lam2, gen) == phi
        return lam2

    def phi(self, pt: "Point") -> "Point":
        """The GLV endomorphism (x, y) -> (endo_base * x, y)."""
        if pt is None:
            return None
        return (self.endo_base * pt[0] % self.base.p, pt[1])

    def __repr__(self) -> str:
        return f"CurveSpec({self.name})"


@functools.cache
def _least_generator(spec: FieldSpec) -> int:
    """Least g generating the full multiplicative group."""
    # p - 1 = 2^32 * t with t odd; factor t enough: check g is non-residue
    # and g^((p-1)/q) != 1 for small prime factors q of t found by trial
    # division (sufficient for the Pasta primes, whose generator is 5).
    p = spec.p
    n = p - 1
    factors = set()
    m = n
    for q in [2, 3, 5, 7, 11, 13]:
        while m % q == 0:
            factors.add(q)
            m //= q
    for g in range(2, 100):
        if all(pow(g, n // q, p) != 1 for q in factors) and (
            m == 1 or pow(g, n // m, p) != 1
        ):
            return g
    raise AssertionError("no generator found")


# Pallas: coordinates in Fp, order = |Fq|. Vesta: coordinates in Fq, order |Fp|.
PALLAS = CurveSpec("pallas", FP, FQ)
VESTA = CurveSpec("vesta", FQ, FP)


def embedded_curve(c: CurveSpec) -> CurveSpec:
    """The cycle partner whose COORDINATES live in c's scalar field — the
    curve that EC gates (complete_add/varbasemul/endomul) operate on
    inside circuits proven over c (kimchi's step/wrap duality)."""
    return VESTA if c is PALLAS or c.name == "pallas" else PALLAS

# Affine point: (x, y) ints, or None for the identity.
Point = tuple[int, int] | None


def is_on_curve(c: CurveSpec, pt: Point) -> bool:
    if pt is None:
        return True
    x, y = pt
    p = c.base.p
    return (y * y - (x * x * x + c.b)) % p == 0


def add(c: CurveSpec, a: Point, b: Point) -> Point:
    p = c.base.p
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        # doubling
        lam = (3 * x1 * x1) * pow(2 * y1, p - 2, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, p - 2, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def neg(c: CurveSpec, a: Point) -> Point:
    if a is None:
        return None
    return (a[0], (-a[1]) % c.base.p)


def mul(c: CurveSpec, k: int, pt: Point) -> Point:
    from .. import native

    k = k % c.scalar.p
    if pt is None or k == 0:
        return None
    out = native.msm(c.base.p, [pt], [k])
    if out != "fallback":
        return out
    return jmul(c, k, pt)


def mul_affine_ladder(c: CurveSpec, k: int, pt: Point) -> Point:
    """Reference affine double-and-add (slow; used to cross-check jmul)."""
    k %= c.scalar.p
    acc: Point = None
    base = pt
    while k:
        if k & 1:
            acc = add(c, acc, base)
        base = add(c, base, base)
        k >>= 1
    return acc


def msm(c: CurveSpec, scalars: list[int], points: list[Point]) -> Point:
    """MSM: native (C++ Pippenger, native/src/pasta.cpp) when available;
    fast_msm is the Python fallback and correctness oracle."""
    from .. import native

    pairs = [
        (k % c.scalar.p, pt)
        for k, pt in zip(scalars, points)
        if pt is not None and k % c.scalar.p
    ]
    if not pairs:
        return None
    out = native.msm(
        c.base.p, [pt for _, pt in pairs], [k for k, _ in pairs]
    )
    if out != "fallback":
        return out
    return fast_msm(c, scalars, points)


# --- Compression (arkworks-compatible 33-byte little-endian form) ----------

def compress(c: CurveSpec, pt: Point) -> bytes:
    """33-byte form: 32-byte LE x || flags byte (odd-y bit | infinity bit).

    Matches arkworks' short-Weierstrass serialize_compressed layout used by
    the SRS files shipped with the reference (srs/pallas.srs, vesta.srs) —
    trailing byte 0x40 marks infinity, 0x80 marks negative/odd y.
    """
    if pt is None:
        return b"\x00" * 32 + b"\x40"
    x, y = pt
    flag = 0x80 if y > (c.base.p - 1) // 2 else 0x00
    return x.to_bytes(32, "little") + bytes([flag])


def decompress(c: CurveSpec, data: bytes) -> Point:
    assert len(data) == 33
    flags = data[32]
    if flags & 0x40:
        return None
    x = int.from_bytes(data[:32], "little")
    rhs = (x * x * x + c.b) % c.base.p
    y = fh.fsqrt(c.base, rhs)
    if y is None:
        raise ValueError("invalid compressed point: x not on curve")
    y_is_big = y > (c.base.p - 1) // 2
    want_big = bool(flags & 0x80)
    if y_is_big != want_big:
        y = c.base.p - y
    return (x, y)


# --- fast Jacobian arithmetic (host prover workloads) ----------------------

def _jdbl(c: CurveSpec, P):
    """Jacobian doubling (a=0)."""
    if P is None:
        return None
    p = c.base.p
    X, Y, Z = P
    A = X * X % p
    B = Y * Y % p
    C = B * B % p
    D = 2 * ((X + B) * (X + B) - A - C) % p
    E = 3 * A % p
    F = E * E % p
    X3 = (F - 2 * D) % p
    Y3 = (E * (D - X3) - 8 * C) % p
    Z3 = 2 * Y * Z % p
    if Z3 == 0:
        return None
    return (X3, Y3, Z3)


def _jadd(c: CurveSpec, P, Q):
    if P is None:
        return Q
    if Q is None:
        return P
    p = c.base.p
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = Z1 * Z1 % p
    Z2Z2 = Z2 * Z2 % p
    U1 = X1 * Z2Z2 % p
    U2 = X2 * Z1Z1 % p
    S1 = Y1 * Z2 * Z2Z2 % p
    S2 = Y2 * Z1 * Z1Z1 % p
    if U1 == U2:
        if S1 != S2:
            return None
        return _jdbl(c, P)
    H = (U2 - U1) % p
    I = 4 * H * H % p
    J = H * I % p
    r = 2 * (S2 - S1) % p
    V = U1 * I % p
    X3 = (r * r - J - 2 * V) % p
    Y3 = (r * (V - X3) - 2 * S1 * J) % p
    Z3 = 2 * H * Z1 * Z2 % p
    if Z3 == 0:
        return None
    return (X3, Y3, Z3)


def _to_jac(pt: Point):
    return None if pt is None else (pt[0], pt[1], 1)


def _from_jac(c: CurveSpec, P) -> Point:
    if P is None:
        return None
    p = c.base.p
    X, Y, Z = P
    zi = pow(Z, p - 2, p)
    zi2 = zi * zi % p
    return (X * zi2 % p, Y * zi2 * zi % p)


def jmul(c: CurveSpec, k: int, pt: Point) -> Point:
    k %= c.scalar.p
    acc = None
    base = _to_jac(pt)
    while k:
        if k & 1:
            acc = _jadd(c, acc, base)
        base = _jdbl(c, base)
        k >>= 1
    return _from_jac(c, acc)


def fast_msm(c: CurveSpec, scalars: list[int], points: list[Point]) -> Point:
    """Host Pippenger over Jacobian coordinates (13-bit windows)."""
    W = 13
    nwin = (255 + W - 1) // W
    jpts = [_to_jac(pt) for pt in points]
    acc = None
    for w in reversed(range(nwin)):
        if acc is not None:
            for _ in range(W):
                acc = _jdbl(c, acc)
        buckets: dict[int, object] = {}
        for k, pt in zip(scalars, jpts):
            d = (k >> (W * w)) & ((1 << W) - 1)
            if d and pt is not None:
                buckets[d] = _jadd(c, buckets.get(d), pt)
        if buckets:
            # direct weighted sum: d * bucket via 13-bit double-and-add
            total = None
            for d, b in buckets.items():
                contrib = b
                # d * b via double-and-add on the small 13-bit d
                s = None
                dd = d
                while dd:
                    if dd & 1:
                        s = _jadd(c, s, contrib)
                    contrib = _jdbl(c, contrib)
                    dd >>= 1
                total = _jadd(c, total, s)
            acc = _jadd(c, acc, total)
    return _from_jac(c, acc)
