"""Radix-2 evaluation domains over the Pasta scalar fields.

Host-side FFT/IFFT for the prover (fixture generation) and domain
constants for the verifier (group generator, vanishing/Lagrange
evaluations). Mirrors arkworks' `Radix2EvaluationDomain` used throughout
kimchi (Step domain 2^18 / Wrap domain 2^17, reference README.md:479-486);
both Pasta primes have 2-adicity 32 so any n = 2^k <= 2^32 works.
"""

from __future__ import annotations

import dataclasses
import functools

from ..fields.params import TWO_ADICITY, FieldSpec


@dataclasses.dataclass(frozen=True)
class Domain:
    field: FieldSpec
    log_size: int

    @property
    def n(self) -> int:
        return 1 << self.log_size

    @functools.cached_property
    def omega(self) -> int:
        """Primitive n-th root of unity."""
        p = self.field.p
        # 2^32-th root from the field's 2-adic generator
        from ..curves.host import _least_generator

        g = _least_generator(self.field)
        root = pow(g, self.field.trace, p)  # order 2^32
        for _ in range(TWO_ADICITY - self.log_size):
            root = root * root % p
        assert pow(root, self.n, p) == 1 and pow(root, self.n // 2, p) != 1
        return root

    @functools.cached_property
    def omega_inv(self) -> int:
        return pow(self.omega, self.field.p - 2, self.field.p)

    @functools.cached_property
    def n_inv(self) -> int:
        return pow(self.n, self.field.p - 2, self.field.p)

    def vanishing_eval(self, x: int) -> int:
        """Z_H(x) = x^n - 1."""
        return (pow(x, self.n, self.field.p) - 1) % self.field.p

    def lagrange_eval(self, i: int, x: int) -> int:
        """L_i(x) = omega^i (x^n - 1) / (n (x - omega^i)) for x not in H."""
        p = self.field.p
        wi = pow(self.omega, i, p)
        num = wi * self.vanishing_eval(x) % p
        den = self.n * (x - wi) % p
        return num * pow(den, p - 2, p) % p


def _bit_reverse(a: list[int]) -> list[int]:
    n = len(a)
    out = list(a)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            out[i], out[j] = out[j], out[i]
    return out


def _ntt(a: list[int], root: int, p: int) -> list[int]:
    """Iterative radix-2 NTT (in evaluation order). Dispatches to the
    native (C++) kernel when available (native/src/pasta.cpp); this
    Python body is the fallback and correctness oracle."""
    from .. import native

    if len(a) > 1:
        out = native.ntt(p, a, root)
        if out is not None:
            return out
    return _ntt_py(a, root, p)


def _ntt_py(a: list[int], root: int, p: int) -> list[int]:
    n = len(a)
    a = _bit_reverse(a)
    length = 2
    while length <= n:
        w_len = pow(root, n // length, p)
        for start in range(0, n, length):
            w = 1
            half = length // 2
            for i in range(start, start + half):
                u, v = a[i], a[i + half] * w % p
                a[i] = (u + v) % p
                a[i + half] = (u - v) % p
                w = w * w_len % p
        length <<= 1
    return a


def fft(dom: Domain, coeffs: list[int]) -> list[int]:
    """Coefficients -> evaluations on H (padded/truncated to n)."""
    p = dom.field.p
    a = [c % p for c in coeffs[: dom.n]] + [0] * max(0, dom.n - len(coeffs))
    return _ntt(a, dom.omega, p)


def _scale_geometric(p: int, a: list[int], s0: int, ratio: int) -> list[int]:
    """[a_i * s0 * ratio^i], natively when available."""
    from .. import native

    out = native.scale_geometric(p, a, s0 % p, ratio % p)
    if out is not None:
        return out
    sc = s0 % p
    res = []
    for c in a:
        res.append(c * sc % p)
        sc = sc * ratio % p
    return res


def ifft(dom: Domain, evals: list[int]) -> list[int]:
    p = dom.field.p
    a = _ntt([e % p for e in evals], dom.omega_inv, p)
    return _scale_geometric(p, a, dom.n_inv, 1)


def coset_fft(dom: Domain, coeffs: list[int], shift: int) -> list[int]:
    """Evaluations on shift*H."""
    p = dom.field.p
    a = [c % p for c in coeffs[: dom.n]] + [0] * max(0, dom.n - len(coeffs))
    return _ntt(_scale_geometric(p, a, 1, shift), dom.omega, p)


def coset_ifft(dom: Domain, evals: list[int], shift: int) -> list[int]:
    p = dom.field.p
    a = ifft(dom, evals)
    return _scale_geometric(p, a, 1, pow(shift, p - 2, p))


def poly_eval(coeffs: list[int], x: int, p: int) -> int:
    from .. import native

    if len(coeffs) > 32:
        out = native.poly_eval(p, coeffs, [x % p])
        if out is not None:
            return out[0]
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc
