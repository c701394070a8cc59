"""Kimchi gate constraint expressions, shared by prover and verifiers.

Each gate is a list of polynomial constraints over the row view
(15 current-row registers, 15 next-row registers, 15 coefficients).
The same expression code runs in three contexts through the `ops`
adapter: host big-ints (prover coset evaluation + host verifier) and
device ffl arrays (TPU verifier) — one definition, no drift.

Gate set (reference README.md:398-405: 15 registers, custom gates):
  * generic      — c0*w0 + c1*w1 + c2*w2 + c3*w0*w1 + c4 (+ public)
  * poseidon     — 5 full rounds per row (kimchi layout): round states in
                   w[0..14] and the next row's w[0..2], round constants in
                   the 15 coefficient slots; sbox x^7, MDS from the
                   Poseidon spec. 15 constraints, degree 7.
  * complete_add — complete EC addition (Pallas points in registers):
                   x1 y1 x2 y2 x3 y3 inf same_x s inf_z x21_inv;
                   7 constraints, degree <= 3 (kimchi CompleteAdd).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

from ..hash.poseidon_params import WIDTH, PoseidonSpec

GATE_GENERIC = "generic"
GATE_POSEIDON = "poseidon"
GATE_COMPLETE_ADD = "complete_add"
GATE_ORDER = (GATE_GENERIC, GATE_POSEIDON, GATE_COMPLETE_ADD)

ROUNDS_PER_ROW = 5


@dataclasses.dataclass
class RowView:
    """Values visible to a gate at one row."""

    w: list  # 15 current-row registers
    w_next: list  # 15 next-row registers
    c: list  # 15 coefficients


@dataclasses.dataclass
class FieldOps:
    add: Callable[[Any, Any], Any]
    sub: Callable[[Any, Any], Any]
    mul: Callable[[Any, Any], Any]
    const: Callable[[int], Any]  # lift a python int

    def lin(self, *terms):
        acc = None
        for t in terms:
            acc = t if acc is None else self.add(acc, t)
        return acc


def host_ops(p: int) -> FieldOps:
    return FieldOps(
        add=lambda a, b: (a + b) % p,
        sub=lambda a, b: (a - b) % p,
        mul=lambda a, b: (a * b) % p,
        const=lambda v: v % p,
    )


def generic_constraints(ops: FieldOps, row: RowView, public: Any) -> list:
    c, w = row.c, row.w
    expr = ops.lin(
        ops.mul(c[0], w[0]),
        ops.mul(c[1], w[1]),
        ops.mul(c[2], w[2]),
        ops.mul(c[3], ops.mul(w[0], w[1])),
        c[4],
        public,
    )
    return [expr]


def _sbox7(ops: FieldOps, x):
    x2 = ops.mul(x, x)
    x3 = ops.mul(x2, x)
    x6 = ops.mul(x3, x3)
    return ops.mul(x6, x)


def poseidon_constraints(ops: FieldOps, row: RowView, ps: PoseidonSpec) -> list:
    """5 rounds per row. States: S0 = w[0..2], S1 = w[3..5], ... S4 =
    w[12..14], S5 = next.w[0..2]. Round r constraint (per lane j):
    S_{r+1}[j] == sum_k mds[j][k]*sbox(S_r[k]) + c[3r+j]."""
    out = []
    states = [row.w[3 * r : 3 * r + 3] for r in range(ROUNDS_PER_ROW)]
    states.append(row.w_next[0:3])
    for r in range(ROUNDS_PER_ROW):
        cur, nxt = states[r], states[r + 1]
        sb = [_sbox7(ops, cur[k]) for k in range(WIDTH)]
        for j in range(WIDTH):
            acc = ops.lin(
                *[
                    ops.mul(ops.const(ps.mds[j][k]), sb[k])
                    for k in range(WIDTH)
                ],
                row.c[3 * r + j],
            )
            out.append(ops.sub(nxt[j], acc))
    return out


def complete_add_constraints(ops: FieldOps, row: RowView) -> list:
    """Kimchi CompleteAdd: registers
    x1 y1 x2 y2 x3 y3 inf same_x s inf_z x21_inv  (w[0..10]).

    Constraints (proof-systems circuits/polynomials/complete_add.rs):
      1. (x2-x1) * (same_x - (1 - (x2-x1)*x21_inv)) ... expressed as:
         same_x * (x2 - x1) = 0  and  (1 - same_x) - (x2-x1)*x21_inv
         combined kimchi-style below.
    """
    x1, y1, x2, y2, x3, y3, inf, same_x, s, inf_z, x21_inv = row.w[:11]
    one = ops.const(1)
    x21 = ops.sub(x2, x1)
    y21 = ops.sub(y2, y1)
    out = []
    # c1: x21 * x21_inv = 1 - same_x
    out.append(ops.sub(ops.mul(x21, x21_inv), ops.sub(one, same_x)))
    # c2: same_x * x21 = 0
    out.append(ops.mul(same_x, x21))
    # c3: slope: same_x*(2y1*s - 3x1^2) + (1-same_x)*(x21*s - y21) = 0
    x1sq = ops.mul(x1, x1)
    dbl = ops.sub(
        ops.mul(ops.add(y1, y1), s), ops.mul(ops.const(3), x1sq)
    )
    add_ = ops.sub(ops.mul(x21, s), y21)
    out.append(
        ops.add(ops.mul(same_x, dbl), ops.mul(ops.sub(one, same_x), add_))
    )
    # c4: x3 = s^2 - x1 - x2
    out.append(ops.sub(ops.add(x3, ops.add(x1, x2)), ops.mul(s, s)))
    # c5: y3 = s*(x1 - x3) - y1
    out.append(ops.sub(ops.add(y3, y1), ops.mul(s, ops.sub(x1, x3))))
    # c6: inf = same_x * (1 - inf_z*(y2 - y1))... kimchi: inf is 1 iff
    # same_x and y1 != y2: inf = same_x * (1 - (y2-y1)*inf_z is wrong
    # direction); constraints: (y2-y1)*inf_z = inf  when same_x;
    #   c6: same_x*(y21*inf_z - inf) + (1-same_x)*inf = 0
    out.append(
        ops.add(
            ops.mul(same_x, ops.sub(ops.mul(y21, inf_z), inf)),
            ops.mul(ops.sub(one, same_x), inf),
        )
    )
    # c7: inf * (1 - inf) = 0 (booleanity) plus y21*(inf_z*y21 - inf)=0
    # ensures inf_z is the inverse witness when y21 != 0
    out.append(ops.mul(y21, ops.sub(ops.mul(inf_z, y21), inf)))
    return out


def n_constraints(ps: PoseidonSpec) -> dict[str, int]:
    return {
        GATE_GENERIC: 1,
        GATE_POSEIDON: ROUNDS_PER_ROW * WIDTH,
        GATE_COMPLETE_ADD: 7,
    }


def all_gate_constraints(
    ops: FieldOps,
    row: RowView,
    selectors: dict[str, Any],
    public: Any,
    ps: PoseidonSpec,
    alpha_pows: list,
) -> Any:
    """Selector-weighted, alpha-combined sum of every gate constraint."""
    exprs: list = []
    for e in generic_constraints(ops, row, public):
        exprs.append(ops.mul(selectors[GATE_GENERIC], e))
    for e in poseidon_constraints(ops, row, ps):
        exprs.append(ops.mul(selectors[GATE_POSEIDON], e))
    for e in complete_add_constraints(ops, row):
        exprs.append(ops.mul(selectors[GATE_COMPLETE_ADD], e))
    acc = None
    for i, e in enumerate(exprs):
        term = ops.mul(alpha_pows[i], e)
        acc = term if acc is None else ops.add(acc, term)
    return acc


N_GATE_CONSTRAINTS = 1 + ROUNDS_PER_ROW * WIDTH + 7  # 23
