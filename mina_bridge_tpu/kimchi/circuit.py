"""PLONK circuit representation: generic gates + 7-column permutation.

The constraint system skeleton of the Kimchi verifier stack (reference
README.md:396-405: 15 registers, permutation argument; gates pinned in the
`kimchi` crate, core/Cargo.toml:14). Round-1 scope: the generic gate
(ql*w0 + qr*w1 + qo*w2 + qm*w0*w1 + qc + p(X) = 0) plus the full
7-column permutation argument — the structural core shared by every
kimchi gate; custom gates (poseidon, EC ops, lookups) layer on the same
machinery. See PARITY.md for the deviation ledger.
"""

from __future__ import annotations

import dataclasses
import functools
import random

from ..fields.params import FieldSpec
from .domain import Domain, fft, ifft

COLUMNS = 15  # kimchi register count (README.md:398)
PERMUTS = 7  # columns under copy constraints


@functools.cache
def shifts(field: FieldSpec, log_size: int) -> tuple[int, ...]:
    """Multiplicative coset shifts k_0=1, k_1..k_6 with pairwise-distinct
    cosets k_i * H (verified: (k_i/k_j)^n != 1)."""
    n = 1 << log_size
    p = field.p
    out = [1]
    cand = 2
    while len(out) < PERMUTS:
        ok = all(
            pow(cand * pow(k, p - 2, p) % p, n, p) != 1 for k in out
        ) and pow(cand, n, p) != 1
        if ok:
            out.append(cand)
        cand += 1
    return tuple(out)


@dataclasses.dataclass
class Circuit:
    """Fixed circuit: selectors per row + wiring permutation.

    wiring[(col, row)] = (col', row') — the permutation sends each cell of
    the first PERMUTS columns to the next cell in its copy-cycle.
    """

    domain: Domain
    npub: int
    ql: list[int]
    qr: list[int]
    qo: list[int]
    qm: list[int]
    qc: list[int]
    wiring: dict

    @property
    def n(self) -> int:
        return self.domain.n

    def sigma_evals(self) -> list[list[int]]:
        """Evaluations of sigma_0..sigma_6 on H."""
        p = self.domain.field.p
        ks = shifts(self.domain.field, self.domain.log_size)
        omega = self.domain.omega
        pow_omega = [1] * self.n
        for i in range(1, self.n):
            pow_omega[i] = pow_omega[i - 1] * omega % p
        sig = [[ks[c] * pow_omega[r] % p for r in range(self.n)] for c in range(PERMUTS)]
        for (c, r), (c2, r2) in self.wiring.items():
            sig[c][r] = ks[c2] * pow_omega[r2] % p
        return sig

    def selector_coeffs(self) -> dict[str, list[int]]:
        d = self.domain
        return {
            "ql": ifft(d, self.ql),
            "qr": ifft(d, self.qr),
            "qo": ifft(d, self.qo),
            "qm": ifft(d, self.qm),
            "qc": ifft(d, self.qc),
        }

    def check_witness(self, w: list[list[int]], pub: list[int]) -> None:
        """Debug: assert all constraints hold on the witness."""
        p = self.domain.field.p
        for i in range(self.n):
            pub_i = pub[i] if i < len(pub) else 0
            g = (
                self.ql[i] * w[0][i]
                + self.qr[i] * w[1][i]
                + self.qo[i] * w[2][i]
                + self.qm[i] * w[0][i] * w[1][i]
                + self.qc[i]
                + pub_i
            ) % p
            assert g == 0, f"gate constraint failed at row {i}"
        for (c, r), (c2, r2) in self.wiring.items():
            assert w[c][r] == w[c2][r2], f"copy constraint failed {(c, r)}"


class CircuitBuilder:
    """Tiny builder for test circuits: public inputs + a*b=c / a+b=c gates."""

    def __init__(self, field: FieldSpec, log_size: int):
        self.domain = Domain(field, log_size)
        self.rows: list[tuple[int, int, int, int, int]] = []
        self.cycles: list[list[tuple[int, int]]] = []
        self.npub = 0

    def public_input(self) -> tuple[int, int]:
        """Reserve a public-input row (w0 = pub); returns cell (0, row)."""
        assert not self.rows or self.npub == len(self.rows), "publics first"
        row = len(self.rows)
        p = self.domain.field.p
        self.rows.append((p - 1, 0, 0, 0, 0))  # -w0 + pub = 0
        self.npub += 1
        return (0, row)

    def mul_gate(self) -> tuple:
        """w0 * w1 = w2; returns cells ((0,r), (1,r), (2,r))."""
        row = len(self.rows)
        p = self.domain.field.p
        self.rows.append((0, 0, p - 1, 1, 0))
        return ((0, row), (1, row), (2, row))

    def add_gate(self) -> tuple:
        row = len(self.rows)
        p = self.domain.field.p
        self.rows.append((1, 1, p - 1, 0, 0))
        return ((0, row), (1, row), (2, row))

    def connect(self, cells: list[tuple[int, int]]) -> None:
        """Constrain all cells to carry the same value (one copy-cycle)."""
        self.cycles.append(list(cells))

    def build(self) -> Circuit:
        n = self.domain.n
        assert len(self.rows) <= n
        pad = [(0, 0, 0, 0, 0)] * (n - len(self.rows))
        rows = self.rows + pad
        wiring = {}
        for cyc in self.cycles:
            for i, cell in enumerate(cyc):
                wiring[cell] = cyc[(i + 1) % len(cyc)]
        return Circuit(
            domain=self.domain,
            npub=self.npub,
            ql=[r[0] for r in rows],
            qr=[r[1] for r in rows],
            qo=[r[2] for r in rows],
            qm=[r[3] for r in rows],
            qc=[r[4] for r in rows],
            wiring=wiring,
        )
