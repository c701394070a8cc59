"""Work-efficient Pippenger MSM on the Pallas kernel path (rows layout).

Bucket accumulation is a *chunked* segmented scan: the sorted point
stream is split column-major across G lanes, each lane reduces its
T = N/G contiguous elements with ONE `lax.scan` (total work N point-adds
instead of N log N), and segments spanning lane boundaries are repaired
with a log G lane-level segmented scan plus one gather/fix/scatter pass.

All 20 windows (the scalars' 13-bit limb digits) are processed as ONE
batched wave — the window axis rides next to the lane axis, so every
point-add kernel invocation covers 20*G lanes. Every add wave runs the
fused Pallas kernel (curves/pallas_kernels.py).

ops/msm.py remains the jnp reference used by CPU tests to cross-check.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..curves.host import CurveSpec
from ..curves import pallas_kernels as pk
from ..fields import rows
from ..fields.ffl import REP_LIMBS
from ..fields.params import LIMB_BITS, NLIMBS

W = NLIMBS  # number of windows
# Signed-digit recoding: 13-bit digits d in [0, 8191] are recoded to
# d' in [-4096, 4096] with a carry into the next window, and the point
# is conditionally negated (y -> -y is free compared to a point add).
# Buckets cover |d'| in [1, 4096] — half the unsigned range, halving the
# suffix-scan/scatter work of the bucket phase.
HALF = 1 << (LIMB_BITS - 1)  # 4096
FULL = 1 << LIMB_BITS  # 8192
NBUCKETS = HALF + 1  # buckets 0..4096; bucket 0 is junk (dropped)


def _ident(c: CurveSpec, shape) -> jax.Array:
    out = jnp.zeros((3, REP_LIMBS) + tuple(shape), jnp.int32)
    return out.at[1, 0].set(1)


def _padd(c, p, q):
    lanes = math.prod(p.shape[2:])
    pf = p.reshape(3, REP_LIMBS, lanes)
    qf = jnp.broadcast_to(q, p.shape).reshape(3, REP_LIMBS, lanes)
    return pk.padd(c, pf, qf).reshape(p.shape)


def _padd_select(c, p, q, keep_q):
    lanes = math.prod(p.shape[2:])
    pf = p.reshape(3, REP_LIMBS, lanes)
    qf = q.reshape(3, REP_LIMBS, lanes)
    mf = jnp.broadcast_to(keep_q, p.shape[2:]).reshape(lanes)
    return pk.padd_select(c, pf, qf, mf).reshape(p.shape)


def _padd_mixed_select(c, p, q, keep_q, q_inf):
    lanes = math.prod(p.shape[2:])
    pf = p.reshape(3, REP_LIMBS, lanes)
    qf = q.reshape(3, REP_LIMBS, lanes)
    mf = jnp.broadcast_to(keep_q, p.shape[2:]).reshape(lanes)
    inff = jnp.broadcast_to(q_inf, p.shape[2:]).reshape(lanes)
    return pk.padd_mixed_select(c, pf, qf, mf, inff).reshape(p.shape)


def _padd_mixed_select2(c, p, q2, keep_q, q_inf):
    """Mixed-add combine with a 2-row (x, y) q stream."""
    lanes = math.prod(p.shape[2:])
    pf = p.reshape(3, REP_LIMBS, lanes)
    qf = q2.reshape(2, REP_LIMBS, lanes)
    mf = jnp.broadcast_to(keep_q, p.shape[2:]).reshape(lanes)
    inff = jnp.broadcast_to(q_inf, p.shape[2:]).reshape(lanes)
    return pk.padd_mixed_select2(c, pf, qf, mf, inff).reshape(p.shape)


def _pdouble(c, p):
    lanes = math.prod(p.shape[2:])
    return pk.pdouble(c, p.reshape(3, REP_LIMBS, lanes)).reshape(p.shape)


def _to_chunks(x: jax.Array, G: int) -> jax.Array:
    """(..., N) -> (T, ..., G) with element (t, g) = x[..., g*T + t]."""
    N = x.shape[-1]
    T = N // G
    x = x.reshape(x.shape[:-1] + (G, T))
    return jnp.moveaxis(x, -1, 0)


def _lane_segmented_exclusive(c, carry_out, has_start):
    """inflow[..., g] = carry_out[..., g-1] + (inflow[..., g-1] if lane
    g-1 had no segment start): an exclusive SEGMENTED point-scan over the
    lane axis, reset at lanes with a segment start.

    Work-efficient (Blelloch up/down sweep over (value, flag) pairs with
    the segmented-scan combine): ~2G combines in 2 log G waves, versus
    G log G for the naive Hillis formulation — the repair phase drops
    from ~40%% of MSM point-adds to a rounding error.
    carry_out: (3, L, W, G); has_start: (W, G). G must be a power of 2.
    """
    G = carry_out.shape[-1]
    assert G & (G - 1) == 0
    ident = _ident(c, carry_out.shape[2:])

    # inclusive segmented scan of (x, f): combine((v1,f1),(v2,f2)) =
    # (v2 if f2 else v1+v2, f1|f2), applied left-to-right.
    x = carry_out
    f = has_start.astype(jnp.int32)
    levels = G.bit_length() - 1

    # --- upsweep: x[k*2^(d+1) + 2^(d+1)-1] <- combine(left, right) ---
    # state kept as (3, L, W, m, s) with s = 2^(d+1) strides unrolled by
    # reshape; only the last column of each block is updated.
    stash = []  # left-child partial sums per level, for the downsweep
    for d in range(levels):
        m = G >> (d + 1)
        xs = x.reshape(x.shape[:-1] + (m, 2))
        fs_ = f.reshape(f.shape[:-1] + (m, 2))
        left_x, right_x = xs[..., 0], xs[..., 1]
        left_f, right_f = fs_[..., 0], fs_[..., 1]
        stash.append((left_x, left_f))
        # combine: keep right if right starts a segment, else add
        new_x = _padd_select(c, left_x, right_x, right_f)
        new_f = left_f | right_f
        x, f = new_x, new_f

    # --- downsweep: exclusive prefixes flow back down ---
    # E(left child) = E(parent); E(right child) = combine(E(parent),
    # left child's inclusive partial) — the trailing-run semantics of the
    # combine make a segment-start lane's own carry flow in while
    # anything before it is dropped, matching the Hillis formulation.
    excl = ident[..., :1]  # E(root) = identity
    for d in reversed(range(levels)):
        left_x, left_f = stash[d]
        right_excl = _padd_select(c, excl, left_x, left_f)
        m = excl.shape[-1]
        excl = jnp.stack([excl, right_excl], axis=-1).reshape(
            excl.shape[:-1] + (2 * m,)
        )
    return excl


def _searchsorted_right(sorted_wn: jax.Array, queries: jax.Array) -> jax.Array:
    """Batched binary search: per window w, number of elements <= q.

    sorted_wn: (W, N) ascending; queries: (W, D). Returns (W, D) int32 in
    [0, N]. Hand-rolled (17 gather rounds) so it lowers to batched
    take_along_axis instead of a scatter/sort formulation.
    """
    N = sorted_wn.shape[-1]
    lo = jnp.zeros(queries.shape, jnp.int32)
    hi = jnp.full(queries.shape, N, jnp.int32)
    for _ in range(max(1, (N + 1).bit_length())):
        mid = (lo + hi) >> 1
        vm = jnp.take_along_axis(sorted_wn, jnp.minimum(mid, N - 1), axis=-1)
        gt = vm > queries
        hi = jnp.where(gt, mid, hi)
        lo = jnp.where(gt, lo, jnp.minimum(mid + 1, hi))
    return lo


def bucket_sums_all_windows(c, pts_sorted, inf_sorted, dig_sorted, G: int = 4096):
    """Per-digit point sums for all W windows at once (scatter-free).

    pts_sorted: (2, L, W, N) — x/y rows only (the implicit Z is carried
    by inf_sorted: 1 at identity lanes, else affine Z=1 — dropping the
    constant Z row cuts a third of the sorted stream's HBM traffic);
    dig_sorted: (W, N) ascending per window.
    Returns buckets (3, L, W, NBUCKETS); bucket 0 is junk (ignored).

    The chunked segmented scan emits every running prefix; each bucket's
    total is then GATHERED from its segment-end position (found by binary
    search over the sorted digits) instead of scattered from 1.3M
    emissions — the scatter of (3, L, W*N) points was ~half the MSM's
    runtime. Lane-boundary repair adds the Blelloch inflow to buckets
    whose segment starts in an earlier lane (a where-mask, no scatter).
    """
    N = dig_sorted.shape[-1]
    G = min(G, N)
    T = N // G
    assert T * G == N
    change = dig_sorted[:, 1:] != dig_sorted[:, :-1]
    ones = jnp.ones((W, 1), bool)
    seg_start = jnp.concatenate([ones, change], axis=-1).astype(jnp.int32)

    pts_c = _to_chunks(pts_sorted, G)  # (T, 2, L, W, G)
    ss_c = _to_chunks(seg_start, G)
    # q operands are affine inputs: the scan rides the cheaper mixed add,
    # with identity q lanes masked to keep the carry.
    qinf_c = _to_chunks(inf_sorted.astype(jnp.int32), G)  # (T, W, G)

    ident = _ident(c, (W, G))

    def body(carry, inp):
        pts_t, ss_t, qinf_t = inp
        acc = _padd_mixed_select2(c, carry, pts_t, ss_t, qinf_t)
        return acc, acc

    carry_out, vals = jax.lax.scan(body, ident, (pts_c, ss_c, qinf_c))
    # vals: (T, 3, L, W, G); stream position p lives at (t=p%T, g=p//T).

    # segment-end position of each digit d: right(d) - 1
    dvals = jnp.broadcast_to(
        jnp.arange(NBUCKETS, dtype=jnp.int32)[None], (W, NBUCKETS)
    )
    right = _searchsorted_right(dig_sorted, dvals)  # (W, NBUCKETS)
    left = jnp.concatenate(
        [jnp.zeros((W, 1), jnp.int32), right[:, :-1]], axis=-1
    )  # first position of d (= right(d-1), digits are contiguous ints)
    exists = right > left
    pos = jnp.maximum(right - 1, 0)
    g_idx = pos // T
    t_idx = pos - g_idx * T
    w_idx = jax.lax.broadcasted_iota(jnp.int32, (W, NBUCKETS), 0)

    # gather bucket totals: (W, NBUCKETS, 3, L) -> (3, L, W, NBUCKETS)
    gathered = jnp.moveaxis(vals[t_idx, :, :, w_idx, g_idx], (-2, -1), (0, 1))

    # --- lane-boundary repair (per window) ---
    has_start = (jnp.sum(ss_c, axis=0) > 0).astype(jnp.int32)  # (W, G)
    inflow = _lane_segmented_exclusive(c, carry_out, has_start)
    # contiguous advanced indices stay in place: (3, L, W, NBUCKETS)
    inflow_b = inflow[:, :, w_idx, g_idx]
    need_fix = exists & (left < g_idx * T)  # segment starts in earlier lane
    lanes = W * NBUCKETS
    fixed = _padd(
        c,
        gathered.reshape(3, REP_LIMBS, lanes),
        inflow_b.reshape(3, REP_LIMBS, lanes),
    ).reshape(3, REP_LIMBS, W, NBUCKETS)
    buckets = jnp.where(need_fix, fixed, gathered)
    return jnp.where(exists, buckets, _ident(c, (W, NBUCKETS)))


def _chunked_prefix(c, x, reverse=False, G: int = 512):
    """Inclusive prefix point-sum along the LAST axis; leading batch dims
    (e.g. the window axis) ride along. x: (3, L, ..., N)."""
    N = x.shape[-1]
    if reverse:
        x = jnp.flip(x, axis=-1)
    G = min(G, N)
    npad = -(-N // G) * G
    if npad != N:
        x = jnp.concatenate(
            [x, _ident(c, x.shape[2:-1] + (npad - N,))], axis=-1
        )
    xc = _to_chunks(x, G)  # (T, 3, L, ..., G)
    ident = _ident(c, x.shape[2:-1] + (G,))

    def body(carry, xt):
        acc = _padd(c, carry, xt)
        return acc, acc

    lane_total, prefix_c = jax.lax.scan(body, ident, xc)

    steps = max(1, math.ceil(math.log2(G)))

    def body2(r, t):
        sh = jnp.int32(1) << r
        idx = jax.lax.broadcasted_iota(jnp.int32, (G,), 0)
        valid = idx >= sh
        pt = jnp.where(valid, jnp.roll(t, sh, axis=-1), ident)
        return _padd(c, pt, t)

    incl = jax.lax.fori_loop(0, steps, body2, lane_total)
    offs = jnp.roll(incl, 1, axis=-1)
    first = jax.lax.broadcasted_iota(jnp.int32, (G,), 0) == 0
    offs = jnp.where(first, ident, offs)

    def body3(carry, pt):
        return carry, _padd(c, pt, offs)

    _, out_c = jax.lax.scan(body3, 0, prefix_c)
    out = jnp.moveaxis(out_c, 0, -1)  # (3, L, ..., G, T)
    # (..., G, T) -> flat lanes with index g*T + t (chunk order)
    out = out.reshape(x.shape)[..., :N]
    if reverse:
        out = jnp.flip(out, axis=-1)
    return out


def _reduce_last(c, x):
    """Total point sum along the last axis via log-halving. x: (3,L,...,N)."""
    n = x.shape[-1]
    t = x
    while n > 1:
        half = n // 2
        red = _padd(c, t[..., :half], t[..., half : 2 * half])
        if n % 2:
            red = jnp.concatenate([red, t[..., -1:]], axis=-1)
            n = half + 1
        else:
            n = half
        t = red
    return t[..., 0]


def msm_rows(
    c: CurveSpec, scalars: jax.Array, points_rows: jax.Array, G: int = 256
) -> jax.Array:
    """MSM over rows-layout points (3, L, N); scalars (N, 20) canonical.

    G = lanes per segmented-scan chunk (tunable: scan work is G-invariant
    but chunk count N/G is sequential depth). Re-swept on the attached
    TPU after the matrix-fold kernel change (2^16, K pts/s):
    G=2048: 672, 1024: 695, 512: 720, 256: 728 (best), 128: 706, 64: 631
    — the optimum moved well below the round-1 G=2048 as the per-wave
    kernels got cheaper. Returns a single projective point in rows
    layout (3, L, 1).
    """
    N = scalars.shape[0]
    # Pad N up to a multiple of the chunk width G with (0, identity)
    # pairs (zero digits land in the junk bucket; identity points are
    # absorbed by the complete adds). This keeps G large for arbitrary N
    # — e.g. the batched verifier's SRS+virtual-row point counts — at
    # <G/N relative overhead, instead of collapsing G to gcd-like sizes.
    G = min(G, 1 << max(0, math.ceil(math.log2(max(N, 1)))))
    pad = -N % G
    if pad:
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((pad, NLIMBS), jnp.int32)]
        )
        points_rows = jnp.concatenate(
            [points_rows, _ident(c, (pad,))], axis=-1
        )
        N += pad
    digits = jnp.moveaxis(scalars, -1, 0)  # (W, N), unsigned in [0, 8191]

    # signed-digit recoding: d + carry -> (mag, sign) with mag <= 4096.
    # Scalars are canonical (< p < 2^255) so the top window never carries.
    def recode(carry, d):
        t = d + carry
        neg = (t > HALF).astype(jnp.int32)
        mag = jnp.where(neg != 0, FULL - t, t)
        return neg, (mag, neg)

    _, (mags, negs) = jax.lax.scan(
        recode, jnp.zeros((N,), jnp.int32), digits
    )

    if N <= (1 << 17):
        # single-operand sort of packed keys (mag | neg | lane): ~2x
        # cheaper than argsort's key+payload sort, and the two
        # take_along_axis gathers come out of the unpacked key for free.
        lane = jax.lax.broadcasted_iota(jnp.int32, (W, N), 1)
        key = (mags << 18) | (negs << 17) | lane  # < 2^31
        key_sorted = jax.lax.sort(key, dimension=-1)
        dig_sorted = key_sorted >> 18
        neg_sorted = (key_sorted >> 17) & 1
        orders = key_sorted & ((1 << 17) - 1)
    else:
        orders = jnp.argsort(mags, axis=-1)  # (W, N)
        dig_sorted = jnp.take_along_axis(mags, orders, axis=-1)
        neg_sorted = jnp.take_along_axis(negs, orders, axis=-1)
    # gather only the affine x/y rows (Z rides as the 1-bit inf vector:
    # a third less HBM traffic through the sort/scan stream — the gather
    # was the single largest MSM stage at 2^16)
    inf = (points_rows[2, 0] == 0).astype(jnp.int32)  # (N,)
    inf_sorted = inf[orders]  # (W, N)
    pts_sorted = points_rows[:2][:, :, orders]  # (2, L, W, N)
    # conditional negation rides the (lazy, loose-bounds) y rows: -y is a
    # rows.sub_r from zero, masked per (window, element)
    y = pts_sorted[1].reshape(REP_LIMBS, W * N)
    y_neg = rows.sub_r(c.base, jnp.zeros_like(y), y)
    y_sel = jnp.where(neg_sorted.reshape(W * N) != 0, y_neg, y)
    pts_sorted = pts_sorted.at[1].set(y_sel.reshape(REP_LIMBS, W, N))

    buckets = bucket_sums_all_windows(c, pts_sorted, inf_sorted, dig_sorted, G)
    suffix = _chunked_prefix(c, buckets, reverse=True)  # (3, L, W, NB)
    totals = _reduce_last(c, suffix[..., 1:])  # (3, L, W)

    # Horner over windows: S = ((S_19*2^13 + S_18)*2^13 + ...) + S_0
    acc = totals[..., W - 1 : W]

    def horner(w, acc):
        def dbl(i, a):
            return _pdouble(c, a)

        acc = jax.lax.fori_loop(0, LIMB_BITS, dbl, acc)
        nxt = jax.lax.dynamic_slice_in_dim(totals, W - 2 - w, 1, axis=-1)
        return _padd(c, acc, nxt)

    acc = jax.lax.fori_loop(0, W - 1, horner, acc)
    return acc


def msm(
    c: CurveSpec, scalars: jax.Array, points: jax.Array, G: int = 256
) -> jax.Array:
    """Drop-in for ops.msm.msm: (N,3,L) points -> (3,L) REP point."""
    rows_pts = pk.to_rows(points)
    out = msm_rows(c, scalars, rows_pts, G=G)
    return pk.from_rows(out)[0]
