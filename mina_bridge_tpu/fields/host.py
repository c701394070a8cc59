"""Host (CPU, arbitrary-precision) reference implementation of the Pasta fields.

This is the correctness oracle for the device limb arithmetic in ff.py and
the workhorse for host-side codecs (SRS decompression, binprot, base58).
Mirrors the capabilities the reference gets from `ark-ff`/`mina-curves`
(reference core/Cargo.toml:19-21).
"""

from __future__ import annotations

from .params import FP, FQ, TWO_ADICITY, FieldSpec


def fadd(spec: FieldSpec, a: int, b: int) -> int:
    return (a + b) % spec.p


def fsub(spec: FieldSpec, a: int, b: int) -> int:
    return (a - b) % spec.p


def fmul(spec: FieldSpec, a: int, b: int) -> int:
    return (a * b) % spec.p


def fneg(spec: FieldSpec, a: int) -> int:
    return (-a) % spec.p


def fpow(spec: FieldSpec, a: int, e: int) -> int:
    return pow(a, e, spec.p)


def finv(spec: FieldSpec, a: int) -> int:
    """Inverse; finv(0) == 0 by convention (matches device ff.inv)."""
    return pow(a, spec.p - 2, spec.p)


def legendre(spec: FieldSpec, a: int) -> int:
    """1 if QR, -1 if non-residue, 0 if zero."""
    if a % spec.p == 0:
        return 0
    r = pow(a, (spec.p - 1) // 2, spec.p)
    return 1 if r == 1 else -1


def fsqrt(spec: FieldSpec, a: int) -> int | None:
    """Tonelli-Shanks square root (both Pasta primes have 2-adicity 32).

    Returns the even root's canonical value (caller picks parity) or None
    if `a` is a non-residue.
    """
    p = spec.p
    a %= p
    if a == 0:
        return 0
    if legendre(spec, a) != 1:
        return None
    t = spec.trace
    z = pow(spec.nonresidue, t, p)  # generator of the 2-Sylow subgroup
    m = TWO_ADICITY
    c = z
    u = pow(a, t, p)  # a^t
    r = pow(a, (t + 1) // 2, p)
    while u != 1:
        # find least i with u^(2^i) == 1
        i = 0
        s = u
        while s != 1:
            s = s * s % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m = i
        c = b * b % p
        u = u * c % p
        r = r * b % p
    return r


def to_bytes_le(spec: FieldSpec, a: int) -> bytes:
    return int(a % spec.p).to_bytes(32, "little")


def from_bytes_le(spec: FieldSpec, b: bytes) -> int:
    return int.from_bytes(b, "little") % spec.p


__all__ = [
    "FP",
    "FQ",
    "fadd",
    "fsub",
    "fmul",
    "fneg",
    "fpow",
    "finv",
    "fsqrt",
    "legendre",
    "to_bytes_le",
    "from_bytes_le",
]
