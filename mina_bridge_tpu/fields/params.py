"""Pasta field parameters.

The two Pasta primes (Pallas base field Fp == Vesta scalar field; Vesta base
field Fq == Pallas scalar field) both have the form ``2^254 + t0`` with
``t0 < 2^126`` and 2-adicity 32.  This structure drives the TPU limb design:
a 510-bit product folds to < 2^261 with two multiplications by the small
constant ``64*t0`` (because ``2^260 === -64*t0 (mod p)``), after which a
7-bit estimated quotient finishes exact reduction.

Reference parity: mina_bridge uses these fields via the `mina-curves` /
`openmina_algebra` crates (reference core/Cargo.toml:19-21,44-49 and
README.md:477-516).  Here they are first-class constants of the TPU
framework.

Limb layout: 20 limbs x 13 bits, little-endian, stored in int32 lanes.
13 bits is the largest limb size for which a 20-term schoolbook inner
product of limb products stays below 2^31 (20 * (2^13-1)^2 < 2^30.4),
so all accumulation is exact in int32 without 64-bit hardware multiplies
(TPUs have none).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

# Limb configuration (shared by both fields).
LIMB_BITS = 13
NLIMBS = 20  # 20 * 13 = 260 >= 255
LIMB_MASK = (1 << LIMB_BITS) - 1
FOLD_SHIFT = NLIMBS * LIMB_BITS  # 260

# Pasta primes (public constants, zcash/pasta).
P_PALLAS = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
P_VESTA = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

TWO_ADICITY = 32


def int_to_limbs(x: int, n: int = NLIMBS) -> np.ndarray:
    """Little-endian base-2^13 limbs of a (possibly big) non-negative int."""
    out = np.zeros((n,), dtype=np.int32)
    for i in range(n):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("value does not fit in %d limbs" % n)
    return out


def limbs_to_int(limbs) -> int:
    """Inverse of int_to_limbs; accepts any 1-D integer array (signed ok)."""
    x = 0
    for i, v in enumerate(np.asarray(limbs).tolist()):
        x += int(v) << (LIMB_BITS * i)
    return x


def _nlimbs_for(x: int) -> int:
    n = 0
    while x:
        n += 1
        x >>= LIMB_BITS
    return max(n, 1)


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static parameters of one Pasta prime field, limb-decomposed."""

    name: str
    p: int

    @property
    def t0(self) -> int:
        """p - 2^254 (< 2^126)."""
        return self.p - (1 << 254)

    @property
    def fold_c(self) -> int:
        """64 * t0; 2^260 === -fold_c (mod p)."""
        return self.t0 << 6

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.p)

    @functools.cached_property
    def fold_limbs(self) -> np.ndarray:
        # 64*t0 < 2^132 -> 11 limbs.
        return int_to_limbs(self.fold_c, _nlimbs_for(self.fold_c))

    @functools.cached_property
    def t0_limbs(self) -> np.ndarray:
        return int_to_limbs(self.t0, _nlimbs_for(self.t0))

    @functools.cached_property
    def inv_exponent_bits(self) -> np.ndarray:
        """Bits of p-2 (msb first) for Fermat inversion."""
        e = self.p - 2
        bits = [(e >> i) & 1 for i in reversed(range(e.bit_length()))]
        return np.array(bits, dtype=np.int32)

    # --- Tonelli-Shanks constants (host-side square roots) ---
    @property
    def trace(self) -> int:
        """Odd t with p - 1 = t * 2^TWO_ADICITY."""
        return (self.p - 1) >> TWO_ADICITY

    @functools.cached_property
    def nonresidue(self) -> int:
        g = 2
        while pow(g, (self.p - 1) // 2, self.p) != self.p - 1:
            g += 1
        return g

    def __repr__(self) -> str:  # keep reprs short in pytest output
        return f"FieldSpec({self.name})"


# Fp: Pallas base field / Vesta scalar field.
FP = FieldSpec("fp", P_PALLAS)
# Fq: Vesta base field / Pallas scalar field.
FQ = FieldSpec("fq", P_VESTA)
