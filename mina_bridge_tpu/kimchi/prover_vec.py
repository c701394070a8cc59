"""Vectorized (native C++) quotient evaluation for the host prover.

The prover's dominant cost is evaluating the combined constraint
polynomial on the 8n coset (kimchi's quotient computation; the reference
does this inside the Rust `kimchi` prover with arkworks' parallel
evaluation-domain ops, core/Cargo.toml:14). The per-row Python loop in
prover_host.prove costs minutes at 2^16 and hours at the real Step 2^18
domain (reference README.md:485), so this module reformulates it as
whole-coset vector ops dispatched to native/src/pasta.cpp: every field
element vector is a numpy (n8, 4) uint64 word array in Montgomery form,
and gates.py's generic `FieldOps` is instantiated with vector semantics
— the SAME constraint definitions drive both paths, so the per-row loop
remains the bit-exactness oracle (tests/test_prover_vec.py).
"""

from __future__ import annotations

import numpy as np

from .. import native
from . import gates as G
from .circuit import COEFFS, COLUMNS, PERMUTS, ZK_ROWS, gate_ctx
from .domain import Domain, coset_ifft


def vec_ops(p: int) -> G.FieldOps:
    """FieldOps over (n, 4) Montgomery word vectors; python ints pass
    through as scalars (converted to Montgomery once, cached)."""
    cache: dict = {}

    def sw(v: int):
        v %= p
        w = cache.get(v)
        if w is None:
            w = native.vto_mont(p, native.ints_to_words([v], p)).reshape(4)
            cache[v] = w
        return w

    def add(a, b):
        if isinstance(a, int):
            if isinstance(b, int):
                return (a + b) % p
            return native.vadd_s(p, b, sw(a))
        if isinstance(b, int):
            return native.vadd_s(p, a, sw(b))
        return native.vadd(p, a, b)

    def sub(a, b):
        if isinstance(a, int):
            if isinstance(b, int):
                return (a - b) % p
            return native.vsub_rs(p, b, sw(a))
        if isinstance(b, int):
            return native.vsub_s(p, a, sw(b))
        return native.vsub(p, a, b)

    def mul(a, b):
        if isinstance(a, int):
            if isinstance(b, int):
                return (a * b) % p
            return native.vmulm_s(p, b, sw(a))
        if isinstance(b, int):
            return native.vmulm_s(p, a, sw(b))
        return native.vmulm(p, a, b)

    return G.FieldOps(add=add, sub=sub, mul=mul, const=lambda v: v % p)


def quotient_evals_vec(
    index,
    circuit,
    w_coeffs,
    z_coeffs,
    s_coeffs,
    zl_coeffs,
    tj_coeffs,
    rt_coeffs,
    pub_coeffs,
    beta: int,
    gamma: int,
    alpha_pows,
    j_pows,
    gpb: int,
    one_pb4: int,
) -> list[int]:
    """Combined-constraint evaluations on the shift*H8 coset, divided by
    Z_H — the vectorized twin of the per-row loop in prover_host.prove
    (which remains the oracle). Returns 8n canonical ints."""
    from .prover_host import ALPHA_LOOKUP, ALPHA_PERM, NSORTED

    dom = circuit.domain
    p = dom.field.p
    n = dom.n
    dom8 = Domain(dom.field, dom.log_size + 3)
    n8 = dom8.n
    shift = 3
    ks = index.shifts
    gctx = gate_ctx(dom.field)
    ops = vec_ops(p)

    def to_mont_padded(coeffs) -> np.ndarray:
        out = np.zeros((n8, 4), dtype=np.uint64)
        w = native.ints_to_words(coeffs, p)
        out[: w.shape[0]] = native.vto_mont(p, w)
        return out

    def ext(coeffs) -> np.ndarray:
        a = to_mont_padded(coeffs)
        native.vscale_geom_m(p, a, 1, shift)
        return native.vnttm(p, a, dom8.omega)

    omega = dom.omega

    def ext_shift(coeffs) -> np.ndarray:
        # coefficients of f(omega X): c_i * omega^i, then coset-extend
        w = native.vto_mont(p, native.ints_to_words(coeffs, p))
        native.vscale_geom_m(p, w, 1, omega)
        a = np.zeros((n8, 4), dtype=np.uint64)
        a[: w.shape[0]] = w
        native.vscale_geom_m(p, a, 1, shift)
        return native.vnttm(p, a, dom8.omega)

    from .domain import ifft

    w_ext = [ext(c) for c in w_coeffs]
    w_next_ext = [ext_shift(c) for c in w_coeffs]
    sig_ext = [ext(c) for c in index.sigma_coeffs]
    coeff_ext = [ext(c) for c in index.coeff_coeffs]
    sel_ext = {k: ext(c) for k, c in index.sel_coeffs.items()}
    z_ext, zw_ext = ext(z_coeffs), ext_shift(z_coeffs)
    s_ext = [ext(c) for c in s_coeffs]
    sw_ext = [ext_shift(c) for c in s_coeffs]
    zl_ext, zlw_ext = ext(zl_coeffs), ext_shift(zl_coeffs)
    tj_ext, tjw_ext = ext(tj_coeffs), ext_shift(tj_coeffs)
    qlk_ext = ext(index.qlk_coeffs)
    rt_ext = ext(rt_coeffs)
    rtsel_ext = ext(index.table_coeffs[4])
    lnm1_ext = ext(ifft(dom, [0] * (n - 1) + [1]))
    lzk_ext = ext(ifft(dom, [int(i == n - ZK_ROWS) for i in range(n)]))
    l0_ext = ext(ifft(dom, [1] + [0] * (n - 1)))
    pub_ext = ext(pub_coeffs)

    # xi = shift * omega8^i as a geometric vector
    xs = to_mont_padded([1] * n8)
    native.vscale_geom_m(p, xs, shift, dom8.omega)

    omega_last = pow(omega, n - 1, p)
    omega_zk = [pow(omega, n - j, p) for j in range(1, ZK_ROWS + 1)]

    row = G.RowView(w=w_ext, w_next=w_next_ext, c=coeff_ext)
    selectors = {g_: sel_ext[g_] for g_ in G.GATE_ORDER}
    gate = G.all_gate_constraints(ops, row, selectors, pub_ext, gctx, alpha_pows)

    num = den = None
    for j in range(PERMUTS):
        nt = ops.add(ops.add(w_ext[j], ops.mul(beta * ks[j] % p, xs)), gamma)
        dt = ops.add(ops.add(w_ext[j], ops.mul(beta, sig_ext[j])), gamma)
        num = nt if num is None else ops.mul(num, nt)
        den = dt if den is None else ops.mul(den, dt)
    zkpm = None
    for wz in omega_zk:
        t = ops.sub(xs, wz)
        zkpm = t if zkpm is None else ops.mul(zkpm, t)
    p2 = ops.mul(ops.sub(ops.mul(z_ext, num), ops.mul(zw_ext, den)), zkpm)
    p1 = ops.mul(l0_ext, ops.sub(z_ext, 1))
    p3 = ops.mul(lzk_ext, ops.sub(z_ext, 1))

    F = G.lookup_f_product(ops, row, selectors, qlk_ext, j_pows, gamma)
    A = None
    for q in range(NSORTED):
        t = ops.add(ops.add(s_ext[q], ops.mul(beta, sw_ext[q])), gpb)
        A = t if A is None else ops.mul(A, t)
    Bv = ops.mul(
        ops.mul(one_pb4, F), ops.add(ops.add(tj_ext, ops.mul(beta, tjw_ext)), gpb)
    )
    lk_rec = ops.mul(
        ops.sub(xs, omega_last),
        ops.sub(ops.mul(zlw_ext, A), ops.mul(zl_ext, Bv)),
    )
    lk_0 = ops.mul(l0_ext, ops.sub(zl_ext, 1))
    lk_last = ops.mul(lnm1_ext, ops.sub(zl_ext, 1))

    combined = ops.lin(
        gate,
        ops.mul(alpha_pows[ALPHA_PERM], p2),
        ops.mul(alpha_pows[ALPHA_PERM + 1], p1),
        ops.mul(alpha_pows[ALPHA_PERM + 2], p3),
        ops.mul(alpha_pows[ALPHA_LOOKUP], lk_rec),
        ops.mul(alpha_pows[ALPHA_LOOKUP + 1], lk_0),
        ops.mul(alpha_pows[ALPHA_LOOKUP + 2], lk_last),
    )
    for q in range(NSORTED - 1):
        combined = ops.add(
            combined,
            ops.mul(
                alpha_pows[ALPHA_LOOKUP + 3 + q],
                ops.mul(lnm1_ext, ops.sub(s_ext[q], sw_ext[q + 1])),
            ),
        )
    combined = ops.add(
        combined,
        ops.mul(
            alpha_pows[ALPHA_LOOKUP + 3 + NSORTED - 1],
            ops.mul(ops.sub(1, rtsel_ext), rt_ext),
        ),
    )

    # zh_i = xi^n - 1 = shift^n * (omega8^n)^i - 1: a geometric vector
    zh = to_mont_padded([1] * n8)
    native.vscale_geom_m(p, zh, pow(shift, n, p), pow(dom8.omega, n, p))
    zh = ops.sub(zh, 1)
    t_vals = ops.mul(combined, native.vinvm(p, zh))
    return native.words_to_ints(native.vfrom_mont(p, t_vals))


def quotient_coeffs(
    index,
    circuit,
    w_coeffs,
    z_coeffs,
    s_coeffs,
    zl_coeffs,
    tj_coeffs,
    rt_coeffs,
    pub_coeffs,
    beta,
    gamma,
    alpha_pows,
    j_pows,
    gpb,
    one_pb4,
) -> list[int]:
    """t coefficients (length 8n) via the vectorized coset evaluation."""
    dom8 = Domain(circuit.domain.field, circuit.domain.log_size + 3)
    t_evals = quotient_evals_vec(
        index, circuit, w_coeffs, z_coeffs, s_coeffs, zl_coeffs, tj_coeffs,
        rt_coeffs, pub_coeffs, beta, gamma, alpha_pows, j_pows, gpb, one_pb4,
    )
    return coset_ifft(dom8, t_evals, 3)
