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
GATE_VARBASEMUL = "varbasemul"
GATE_ENDOMUL = "endomul"
GATE_ENDOMULSCALAR = "endomulscalar"
GATE_XOR = "xor"
GATE_RANGECHECK = "rangecheck"
GATE_LOOKUP_RT = "lookup_rt"
GATE_ORDER = (
    GATE_GENERIC,
    GATE_POSEIDON,
    GATE_COMPLETE_ADD,
    GATE_VARBASEMUL,
    GATE_ENDOMUL,
    GATE_ENDOMULSCALAR,
    GATE_XOR,
    GATE_RANGECHECK,
    GATE_LOOKUP_RT,
)

ROUNDS_PER_ROW = 5
VBMUL_BITS_PER_CHUNK = 5  # varbasemul: 5 scalar bits per 2-row chunk
ENDOMUL_BITS_PER_ROW = 4  # endomul: 4 scalar bits (2 crumbs) per row
EMSCALAR_CRUMBS_PER_ROW = 8  # endomulscalar: 8 two-bit crumbs per row

# --- lookup argument shape (kimchi lookup/constraints.rs structure) ---
LOOKUPS_PER_ROW = 4  # kimchi max_lookups_per_row
NSORTED = LOOKUPS_PER_ROW + 1  # sorted-multiset columns s_0..s_4
JOINT_WIDTH = 3  # max table width (xor: in1, in2, out)
# fixed table ids; the joint-combined entry is
#   col0 + j*col1 + j^2*col2 + j^3*table_id
# so the id rides the JOINT_WIDTH-th power of the joint combiner
# (kimchi's table_id_combiner). Table 0 must contain the all-zero row:
# its joint value 0 is the dummy for inactive query slots.
TABLE_ID_PRIMARY = 0
TABLE_ID_XOR = 1
TABLE_ID_RANGE = 2
TABLE_ID_RUNTIME = 3


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


def varbasemul_constraints(ops: FieldOps, row: RowView) -> list:
    """Kimchi VarBaseMul: 5 double-and-add steps Acc <- 2*Acc + (2b-1)*T
    per 2-row chunk, each step as one combined (Acc + Q) + Acc double
    chord (Halo trick, kimchi varbasemul.rs layout):

      curr: xT yT x0 y0 n n' -- x1 y1 x2 y2 x3 y3 x4 y4
      next: x5 y5 b0 b1 b2 b3 b4 s0 s1 s2 s3 s4

    Per bit i with P=(x_i,y_i), Out=(x_{i+1},y_{i+1}), slope s_i of the
    chord P -> (2b_i-1)*T (the second chord is eliminated):
      1. b_i (b_i - 1) = 0
      2. (x_i - xT) s_i = y_i - (2 b_i - 1) yT
      3. (2 x_i + xT - s_i^2)((x_i - x_{i+1}) s_i + y_{i+1} + y_i)
           = 2 y_i (x_i - x_{i+1})
      4. (y_{i+1} + y_i)^2 = (x_i - x_{i+1})^2 (s_i^2 - xT + x_{i+1})
    plus the scalar accumulator n' = 32 n + 16 b0 + 8 b1 + 4 b2 + 2 b3 + b4.
    21 constraints, max degree 4 (before the selector)."""
    xT, yT = row.w[0], row.w[1]
    n, n_prime = row.w[4], row.w[5]
    xs = [row.w[2], row.w[7], row.w[9], row.w[11], row.w[13], row.w_next[0]]
    ys = [row.w[3], row.w[8], row.w[10], row.w[12], row.w[14], row.w_next[1]]
    bs = [row.w_next[2 + i] for i in range(VBMUL_BITS_PER_CHUNK)]
    ss = [row.w_next[7 + i] for i in range(VBMUL_BITS_PER_CHUNK)]
    one = ops.const(1)
    two = ops.const(2)
    out = []
    acc = n
    for b in bs:
        acc = ops.add(ops.add(acc, acc), b)
    out.append(ops.sub(n_prime, acc))
    for i in range(VBMUL_BITS_PER_CHUNK):
        b, s = bs[i], ss[i]
        xp, yp, xo, yo = xs[i], ys[i], xs[i + 1], ys[i + 1]
        out.append(ops.mul(b, ops.sub(b, one)))
        sign_y = ops.mul(ops.sub(ops.add(b, b), one), yT)  # (2b-1) yT
        out.append(ops.sub(ops.mul(ops.sub(xp, xT), s), ops.sub(yp, sign_y)))
        s2 = ops.mul(s, s)
        dx = ops.sub(xp, xo)
        lhs3 = ops.mul(
            ops.sub(ops.add(ops.add(xp, xp), xT), s2),
            ops.add(ops.mul(dx, s), ops.add(yo, yp)),
        )
        out.append(ops.sub(lhs3, ops.mul(ops.mul(two, yp), dx)))
        sy = ops.add(yo, yp)
        out.append(
            ops.sub(
                ops.mul(sy, sy),
                ops.mul(ops.mul(dx, dx), ops.add(ops.sub(s2, xT), xo)),
            )
        )
    return out


def endomul_constraints(ops: FieldOps, row: RowView, endo: int) -> list:
    """Kimchi EndoMul: 4 bits / 2 endo-steps per row. Each step adds
    Q = (2b_odd - 1) * phi^{b_even}(T) via the same eliminated double
    chord: Acc <- 2*Acc + Q. Layout (kimchi endomul.rs):

      curr: xT yT -- -- xP yP n xR yR s1 s3 b1 b2 b3 b4
      next: --  -- -- -- xS yS n'

    (the output lands in the next row's xP/yP/n slots, so consecutive
    endomul rows chain with no copy constraints). Crumb convention
    (matches ipa.endo_to_field): b1/b3 are the HIGH bits (phi selector),
    b2/b4 the LOW bits (sign):
      xQ1 = (1 + (endo-1) b1) xT, yQ1 = (2 b2 - 1) yT  (P -> R, slope s1)
      xQ2 = (1 + (endo-1) b3) xT, yQ2 = (2 b4 - 1) yT  (R -> S, slope s3)
    and n' = 16 n + 8 b1 + 4 b2 + 2 b3 + b4, so starting from
    Acc = [2](phi(T) + T) over all 64 crumbs of a 128-bit challenge t
    yields Acc_final = [endo_to_field(t)] T. 11 constraints."""
    xT, yT = row.w[0], row.w[1]
    xP, yP = row.w[4], row.w[5]
    n = row.w[6]
    xR, yR = row.w[7], row.w[8]
    s1, s3 = row.w[9], row.w[10]
    b1, b2, b3, b4 = row.w[11], row.w[12], row.w[13], row.w[14]
    xS, yS = row.w_next[4], row.w_next[5]
    n_prime = row.w_next[6]
    one = ops.const(1)
    two = ops.const(2)
    endo_m1 = ops.const(endo - 1)
    out = []
    for b in (b1, b2, b3, b4):
        out.append(ops.mul(b, ops.sub(b, one)))

    def step(xp, yp, xq_sel, yq_sign, s, xo, yo):
        xq = ops.mul(ops.add(one, ops.mul(endo_m1, xq_sel)), xT)
        yq = ops.mul(ops.sub(ops.add(yq_sign, yq_sign), one), yT)
        out.append(ops.sub(ops.mul(ops.sub(xp, xq), s), ops.sub(yp, yq)))
        s2 = ops.mul(s, s)
        dx = ops.sub(xp, xo)
        lhs = ops.mul(
            ops.sub(ops.add(ops.add(xp, xp), xq), s2),
            ops.add(ops.mul(dx, s), ops.add(yo, yp)),
        )
        out.append(ops.sub(lhs, ops.mul(ops.mul(two, yp), dx)))
        sy = ops.add(yo, yp)
        out.append(
            ops.sub(
                ops.mul(sy, sy),
                ops.mul(ops.mul(dx, dx), ops.add(ops.sub(s2, xq), xo)),
            )
        )

    step(xP, yP, b1, b2, s1, xR, yR)
    step(xR, yR, b3, b4, s3, xS, yS)
    acc = n
    for b in (b1, b2, b3, b4):
        acc = ops.add(ops.add(acc, acc), b)
    out.append(ops.sub(n_prime, acc))
    return out


def _emscalar_coeffs(p: int) -> tuple[list[int], list[int]]:
    """Cubic interpolants (mod p) of the crumb -> (d_a, d_b) increments of
    the endo scalar decomposition (kimchi endomul_scalar.rs):
      crumb c = 2*r_hi + r_lo; s = 2*r_lo - 1;
      r_hi == 1 -> a += s  else b += s
    d_a: (0,0) (1,0) (2,-1) (3,1)   d_b: (0,-1) (1,1) (2,0) (3,0)."""
    inv6 = pow(6, p - 2, p)
    # d_a(x) = (2/3) x^3 - (5/2) x^2 + (11/6) x
    da = [0, 11 * inv6 % p, (p - 15 * inv6) % p, 4 * inv6 % p]
    # d_b(x) = (2/3) x^3 - (7/2) x^2 + (29/6) x - 1
    db = [p - 1, 29 * inv6 % p, (p - 21 * inv6) % p, 4 * inv6 % p]
    return da, db


def endomulscalar_constraints(ops: FieldOps, row: RowView, p: int) -> list:
    """Kimchi EndoMulScalar: 8 two-bit crumbs per row, accumulating the
    (a, b) endo decomposition and the plain scalar n. Layout:

      curr: n0 n8 a0 b0 a8 b8 x0 x1 x2 x3 x4 x5 x6 x7

    Constraints: crumb range x(x-1)(x-2)(x-3) = 0 (x8), and
      n8 = 2^16 n0 + sum x_i 4^(7-i)
      a8 = 2^8 a0 + sum d_a(x_i) 2^(7-i)
      b8 = 2^8 b0 + sum d_b(x_i) 2^(7-i)
    11 constraints, max degree 4."""
    n0, n8, a0, b0, a8, b8 = row.w[:6]
    xs = row.w[6 : 6 + EMSCALAR_CRUMBS_PER_ROW]
    da, db = _emscalar_coeffs(p)
    one, two, three = ops.const(1), ops.const(2), ops.const(3)
    out = []

    def cubic(coeffs, x):
        acc = ops.const(coeffs[3])
        for c in (coeffs[2], coeffs[1], coeffs[0]):
            acc = ops.add(ops.mul(acc, x), ops.const(c))
        return acc

    for x in xs:
        out.append(
            ops.mul(
                ops.mul(x, ops.sub(x, one)),
                ops.mul(ops.sub(x, two), ops.sub(x, three)),
            )
        )
    n_acc, a_acc, b_acc = n0, a0, b0
    for x in xs:
        n4 = ops.add(n_acc, n_acc)
        n4 = ops.add(n4, n4)
        n_acc = ops.add(n4, x)
        a_acc = ops.add(ops.add(a_acc, a_acc), cubic(da, x))
        b_acc = ops.add(ops.add(b_acc, b_acc), cubic(db, x))
    out.append(ops.sub(n8, n_acc))
    out.append(ops.sub(a8, a_acc))
    out.append(ops.sub(b8, b_acc))
    return out


def xor_constraints(ops: FieldOps, row: RowView) -> list:
    """Xor gate (kimchi Xor16 role): w0 ^ w1 = w2 checked nibble-wise via
    LOOKUPS_PER_ROW joint lookups into the XOR table. Layout:
      w0=in1, w1=in2, w2=out,
      w3..w6 = in1 nibbles, w7..w10 = in2 nibbles, w11..w14 = out nibbles
    (little-endian, nibble width = c0's log2: c0 = 2^bits).
    3 recomposition constraints; nibble ranges come from the table."""
    c0 = row.c[0]
    out = []
    for base, full in ((3, row.w[0]), (7, row.w[1]), (11, row.w[2])):
        acc = row.w[base + LOOKUPS_PER_ROW - 1]
        for q in range(LOOKUPS_PER_ROW - 2, -1, -1):
            acc = ops.add(ops.mul(acc, c0), row.w[base + q])
        out.append(ops.sub(full, acc))
    return out


def rangecheck_constraints(ops: FieldOps, row: RowView) -> list:
    """Range-check gate (kimchi RangeCheck0 role): w0 < 2^(4*bits) via 4
    limb lookups into the range table. Layout: w0 = value, w1..w4 = limbs
    (little-endian, limb width = log2(c0)). 1 recomposition constraint;
    limb ranges come from the table. Chain rows for wider values."""
    c0 = row.c[0]
    acc = row.w[LOOKUPS_PER_ROW]
    for q in range(LOOKUPS_PER_ROW - 1, 0, -1):
        acc = ops.add(ops.mul(acc, c0), row.w[q])
    return [ops.sub(row.w[0], acc)]


def lookup_rt_constraints(ops: FieldOps, row: RowView) -> list:
    """Runtime-lookup gate (kimchi Lookup gate role): 3 (index, value)
    queries (w1,w2), (w3,w4), (w5,w6) into the runtime table. Pure
    lookups — no polynomial constraints."""
    return []


def lookup_queries(ops: FieldOps, row: RowView, selectors, q_lookup, j_pows):
    """The LOOKUPS_PER_ROW query-slot values f_q as selector-weighted
    joint combinations (j_pows = [1, j, j^2, j^3]); inactive slots
    contribute the dummy 0. Shared by the host prover (witness values +
    coset evals), host verifier and device verifier (opened evals).

    Patterns (disjoint — one lookup kind per row):
      legacy  (q_lookup):        slot 0 = w0 into the primary table
      xor     (sel[xor]):        slot q = (w[3+q], w[7+q], w[11+q])
      range   (sel[rangecheck]): slot q = w[1+q]
      runtime (sel[lookup_rt]):  slot q<3 = (w[1+2q], w[2+2q])
    """
    j1, j2, j3 = j_pows[1], j_pows[2], j_pows[3]
    out = []
    for q in range(LOOKUPS_PER_ROW):
        terms = []
        if q == 0:
            terms.append(ops.mul(q_lookup, row.w[0]))
        xor_joint = ops.lin(
            row.w[3 + q],
            ops.mul(j1, row.w[7 + q]),
            ops.mul(j2, row.w[11 + q]),
            ops.mul(j3, ops.const(TABLE_ID_XOR)),
        )
        terms.append(ops.mul(selectors[GATE_XOR], xor_joint))
        rc_joint = ops.add(
            row.w[1 + q], ops.mul(j3, ops.const(TABLE_ID_RANGE))
        )
        terms.append(ops.mul(selectors[GATE_RANGECHECK], rc_joint))
        if q < 3:
            rt_joint = ops.lin(
                row.w[1 + 2 * q],
                ops.mul(j1, row.w[2 + 2 * q]),
                ops.mul(j3, ops.const(TABLE_ID_RUNTIME)),
            )
            terms.append(ops.mul(selectors[GATE_LOOKUP_RT], rt_joint))
        out.append(ops.lin(*terms))
    return out


def lookup_f_product(ops: FieldOps, row: RowView, selectors, q_lookup, j_pows, gamma):
    """Prod_q (gamma + f_q) in kimchi's degree-bounded disjoint-selector
    form: gamma^4 (1 - sum_p sel_p) + sum_p sel_p prod_q (gamma + q_pq).
    Equal to prod_q (gamma + lookup_queries(...)[q]) ON the domain (where
    selectors are 0/1 and disjoint) but of polynomial degree 5, which
    keeps the aggregation constraint inside the 7n-quotient budget."""
    j1, j2, j3 = j_pows[1], j_pows[2], j_pows[3]
    one = ops.const(1)

    def prod(factors):
        acc = None
        for f in factors:
            acc = f if acc is None else ops.mul(acc, f)
        return acc

    g4 = ops.mul(ops.mul(gamma, gamma), ops.mul(gamma, gamma))
    # legacy: (g + w0) g^3
    legacy = ops.mul(
        ops.add(gamma, row.w[0]), ops.mul(gamma, ops.mul(gamma, gamma))
    )
    xor_p = prod(
        [
            ops.add(
                gamma,
                ops.lin(
                    row.w[3 + q],
                    ops.mul(j1, row.w[7 + q]),
                    ops.mul(j2, row.w[11 + q]),
                    ops.mul(j3, ops.const(TABLE_ID_XOR)),
                ),
            )
            for q in range(LOOKUPS_PER_ROW)
        ]
    )
    rc_p = prod(
        [
            ops.add(
                gamma,
                ops.add(
                    row.w[1 + q], ops.mul(j3, ops.const(TABLE_ID_RANGE))
                ),
            )
            for q in range(LOOKUPS_PER_ROW)
        ]
    )
    rt_p = ops.mul(
        prod(
            [
                ops.add(
                    gamma,
                    ops.lin(
                        row.w[1 + 2 * q],
                        ops.mul(j1, row.w[2 + 2 * q]),
                        ops.mul(j3, ops.const(TABLE_ID_RUNTIME)),
                    ),
                )
                for q in range(3)
            ]
        ),
        gamma,
    )
    sels = [
        (q_lookup, legacy),
        (selectors[GATE_XOR], xor_p),
        (selectors[GATE_RANGECHECK], rc_p),
        (selectors[GATE_LOOKUP_RT], rt_p),
    ]
    sel_sum = None
    acc = None
    for s, pr in sels:
        term = ops.mul(s, pr)
        acc = term if acc is None else ops.add(acc, term)
        sel_sum = s if sel_sum is None else ops.add(sel_sum, s)
    return ops.add(acc, ops.mul(ops.sub(one, sel_sum), g4))


def n_constraints(ps: PoseidonSpec) -> dict[str, int]:
    return {
        GATE_GENERIC: 1,
        GATE_POSEIDON: ROUNDS_PER_ROW * WIDTH,
        GATE_COMPLETE_ADD: 7,
        GATE_VARBASEMUL: 1 + 4 * VBMUL_BITS_PER_CHUNK,
        GATE_ENDOMUL: 11,
        GATE_ENDOMULSCALAR: EMSCALAR_CRUMBS_PER_ROW + 3,
        GATE_XOR: 3,
        GATE_RANGECHECK: 1,
        GATE_LOOKUP_RT: 0,
    }


@dataclasses.dataclass
class GateCtx:
    """Per-field context shared by every gate constraint evaluator."""

    ps: PoseidonSpec  # poseidon round constants / MDS for this field
    endo: int  # endo_base of the EMBEDDED curve (endomul gate)
    p: int  # the circuit field prime (interpolation constants)


def gate_constraints(ops: FieldOps, row: RowView, ctx: GateCtx, public: Any) -> dict:
    """name -> constraint list, in GATE_ORDER."""
    return {
        GATE_GENERIC: generic_constraints(ops, row, public),
        GATE_POSEIDON: poseidon_constraints(ops, row, ctx.ps),
        GATE_COMPLETE_ADD: complete_add_constraints(ops, row),
        GATE_VARBASEMUL: varbasemul_constraints(ops, row),
        GATE_ENDOMUL: endomul_constraints(ops, row, ctx.endo),
        GATE_ENDOMULSCALAR: endomulscalar_constraints(ops, row, ctx.p),
        GATE_XOR: xor_constraints(ops, row),
        GATE_RANGECHECK: rangecheck_constraints(ops, row),
        GATE_LOOKUP_RT: lookup_rt_constraints(ops, row),
    }


def all_gate_constraints(
    ops: FieldOps,
    row: RowView,
    selectors: dict[str, Any],
    public: Any,
    ctx: GateCtx,
    alpha_pows: list,
) -> Any:
    """Selector-weighted, alpha-combined sum of every gate constraint."""
    per_gate = gate_constraints(ops, row, ctx, public)
    exprs: list = []
    for name in GATE_ORDER:
        for e in per_gate[name]:
            exprs.append(ops.mul(selectors[name], e))
    acc = None
    for i, e in enumerate(exprs):
        term = ops.mul(alpha_pows[i], e)
        acc = term if acc is None else ops.add(acc, term)
    return acc


N_GATE_CONSTRAINTS = (
    1 + ROUNDS_PER_ROW * WIDTH + 7 + (1 + 4 * VBMUL_BITS_PER_CHUNK) + 11 + 11
    + 3 + 1 + 0  # xor, rangecheck, lookup_rt
)  # 70
