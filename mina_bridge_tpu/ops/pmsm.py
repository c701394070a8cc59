"""Work-efficient Pippenger MSM on the Pallas kernel path (rows layout).

Successor of ops/msm.py's Hillis-Steele formulation: bucket accumulation
is a *chunked* segmented scan — the sorted point stream is split
column-major across G lanes, each lane reduces its T = N/G contiguous
elements with ONE `lax.scan` (total work N point-adds instead of
N log N), and segments spanning lane boundaries are repaired with a
log G lane-level segmented scan plus one gather/fix/scatter pass. Every
point-add wave runs the fused Pallas kernel (curves/pallas_kernels.py),
so the whole MSM is ~2N add-lanes of VPU work.

Same protocol semantics as ops/msm.py (windows = 13-bit limb digits,
suffix-sum bucket weighting, Horner combine); ops/msm.py remains the
jnp reference used by CPU tests to cross-check this module.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..curves.host import CurveSpec
from ..curves import pallas_kernels as pk
from ..fields.ffl import REP_LIMBS
from ..fields.params import LIMB_BITS, NLIMBS

NBUCKETS = 1 << LIMB_BITS


def _identity_rows(c: CurveSpec, n: int) -> jax.Array:
    out = jnp.zeros((3, REP_LIMBS, n), jnp.int32)
    return out.at[1, 0, :].set(1)


def _to_chunks(x: jax.Array, G: int) -> jax.Array:
    """(..., N) -> (T, ..., G) with element (t, g) = x[..., g*T + t]."""
    N = x.shape[-1]
    T = N // G
    x = x.reshape(x.shape[:-1] + (G, T))  # (..., G, T)
    x = jnp.moveaxis(x, -1, 0)  # (T, ..., G)
    return x


def _lane_segmented_exclusive(c, carry_out, has_start):
    """inflow(g) = carry_out(g-1) + (inflow(g-1) if not has_start(g-1)).

    Hillis-Steele segmented scan over the lane axis (log G steps).
    carry_out: (3, L, G); has_start: (G,) int32. Returns (3, L, G).
    """
    G = carry_out.shape[-1]
    ident = _identity_rows(c, G)
    # inclusive segmented scan of carry_out with segment breaks AFTER
    # flagged lanes: value(g) = sum of carry_out over the maximal run of
    # un-flagged-lane chain ending at g (inclusive).
    x = carry_out
    f = has_start.astype(jnp.int32)
    steps = max(1, math.ceil(math.log2(G)))

    def body(r, st):
        x, f = st
        sh = jnp.int32(1) << r
        idx = jax.lax.broadcasted_iota(jnp.int32, (G,), 0)
        valid = (idx >= sh).astype(jnp.int32)
        px = jnp.where(valid[None, None, :] != 0, jnp.roll(x, sh, axis=-1), ident)
        pf = jnp.where(valid != 0, jnp.roll(f, sh, axis=-1), 1)
        keep = (f != 0) | (valid == 0)
        nx = pk.padd_select(c, px, x, keep.astype(jnp.int32))
        nf = f | pf
        return nx, nf

    x, _ = jax.lax.fori_loop(0, steps, body, (x, f))
    # exclusive shift right by one lane
    inflow = jnp.roll(x, 1, axis=-1)
    inflow = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (G,), 0) == 0)[None, None, :],
        ident,
        inflow,
    )
    return inflow


def bucket_sums(c, pts_sorted, dig_sorted, G: int = 4096):
    """Per-digit point sums of a digit-sorted stream (chunked scan).

    pts_sorted: (3, L, N) rows; dig_sorted: (N,) int32 ascending.
    Returns buckets (3, L, NBUCKETS) where bucket[d] = sum of points with
    digit d (identity when empty; bucket 0 is junk and ignored upstream).
    """
    N = dig_sorted.shape[0]
    G = min(G, N)
    T = N // G
    assert T * G == N
    seg_start = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (dig_sorted[1:] != dig_sorted[:-1]).astype(jnp.int32)]
    )
    seg_end = jnp.concatenate(
        [(dig_sorted[1:] != dig_sorted[:-1]).astype(jnp.int32), jnp.ones((1,), jnp.int32)]
    )
    pts_c = _to_chunks(pts_sorted, G)  # (T, 3, L, G)
    dig_c = _to_chunks(dig_sorted, G)  # (T, G)
    ss_c = _to_chunks(seg_start, G)
    se_c = _to_chunks(seg_end, G)

    ident = _identity_rows(c, G)

    def body(carry, inp):
        pts_t, ss_t, se_t, dig_t = inp
        acc = pk.padd_select(c, carry, pts_t, ss_t)
        idx = jnp.where((se_t != 0) & (dig_t != 0), dig_t, NBUCKETS)
        return acc, (acc, idx)

    carry_out, (vals, idxs) = jax.lax.scan(
        body, ident, (pts_c, ss_c, se_c, dig_c)
    )

    # one scatter of all emitted segment totals; digits are unique across
    # emissions (one end per segment) except the dump slot, so any
    # flattening order works as long as idx and vals agree: use (t, g).
    vals_flat = jnp.transpose(vals, (1, 2, 0, 3)).reshape(3, REP_LIMBS, T * G)
    idx_flat = idxs.reshape(T * G)

    buckets = jnp.zeros((3, REP_LIMBS, NBUCKETS + 1), jnp.int32)
    buckets = buckets.at[1, 0, :].set(1)  # identities
    buckets = jnp.moveaxis(
        jnp.moveaxis(buckets, -1, 0).at[idx_flat].set(
            jnp.moveaxis(vals_flat, -1, 0)
        ),
        0,
        -1,
    )

    # --- lane-boundary repair ---
    has_start = (jnp.sum(ss_c, axis=0) > 0).astype(jnp.int32)  # (G,)
    inflow = _lane_segmented_exclusive(c, carry_out, has_start)

    # first seg_end position/digit per lane; fix needed iff the lane's head
    # continues a previous lane's segment (no seg_start at t=0) and a
    # seg_end exists in the lane.
    any_end = jnp.sum(se_c, axis=0) > 0
    first_end_t = jnp.argmax(se_c, axis=0)  # (G,) first t with end
    fix_digit = jnp.take_along_axis(dig_c, first_end_t[None, :], axis=0)[0]
    head_continues = ss_c[0] == 0
    do_fix = head_continues & any_end & (fix_digit != 0)
    fix_idx = jnp.where(do_fix, fix_digit, NBUCKETS)  # dump when no fix

    # gather bucket values at fix positions, add inflow, scatter back
    gathered = jnp.moveaxis(jnp.moveaxis(buckets, -1, 0)[fix_idx], 0, -1)
    fixed = pk.padd(c, gathered, inflow)
    fixed = jnp.where((do_fix != 0)[None, None, :], fixed, gathered)
    buckets = jnp.moveaxis(
        jnp.moveaxis(buckets, -1, 0).at[fix_idx].set(jnp.moveaxis(fixed, -1, 0)),
        0,
        -1,
    )
    return buckets[..., :NBUCKETS]


def _chunked_prefix(c, x, reverse=False, G: int = 512):
    """Work-efficient inclusive prefix point-sum along lanes of (3, L, N)."""
    N = x.shape[-1]
    if reverse:
        x = jnp.flip(x, axis=-1)
    G = min(G, N)
    npad = -(-N // G) * G
    if npad != N:
        # pad with identities at the tail (does not affect prefixes of
        # the first N entries)
        x = jnp.concatenate([x, _identity_rows(c, npad - N)], axis=-1)
    xc = _to_chunks(x, G)  # (T, 3, L, G)
    ident = _identity_rows(c, G)

    def body(carry, xt):
        acc = pk.padd(c, carry, xt)
        return acc, acc

    lane_total, prefix_c = jax.lax.scan(body, ident, xc)

    # exclusive Hillis scan of lane totals
    steps = max(1, math.ceil(math.log2(G)))

    def body2(r, t):
        sh = jnp.int32(1) << r
        idx = jax.lax.broadcasted_iota(jnp.int32, (G,), 0)
        valid = idx >= sh
        pt = jnp.where(valid[None, None, :], jnp.roll(t, sh, axis=-1), ident)
        return pk.padd(c, pt, t)

    incl = jax.lax.fori_loop(0, steps, body2, lane_total)
    offs = jnp.roll(incl, 1, axis=-1)
    offs = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (G,), 0) == 0)[None, None, :],
        ident,
        offs,
    )

    def body3(carry, pt):
        return carry, pk.padd(c, pt, offs)

    _, out_c = jax.lax.scan(body3, 0, prefix_c)
    # back to flat lanes with index g*T + t (chunk order)
    out = jnp.transpose(out_c, (1, 2, 3, 0)).reshape(3, REP_LIMBS, npad)
    out = out[..., :N]
    if reverse:
        out = jnp.flip(out, axis=-1)
    return out


def _reduce_all(c, x, G: int = 512):
    """Total point sum along lanes of (3, L, N) -> (3, L, 1)."""
    N = x.shape[-1]
    G = min(G, N)
    npad = -(-N // G) * G
    if npad != N:
        x = jnp.concatenate([x, _identity_rows(c, npad - N)], axis=-1)
    xc = _to_chunks(x, G)
    ident = _identity_rows(c, G)

    def body(carry, xt):
        return pk.padd(c, carry, xt), None

    lane_total, _ = jax.lax.scan(body, ident, xc)
    # log-halving reduce across lanes
    n = G
    t = lane_total
    while n > 1:
        half = n // 2
        a = t[..., :half]
        b = t[..., half : 2 * half]
        red = pk.padd(c, a, b)
        if n % 2:
            red = jnp.concatenate([red, t[..., -1:]], axis=-1)
            t = red
            n = half + 1
        else:
            t = red
            n = half
    return t


def msm_rows(c: CurveSpec, scalars: jax.Array, points_rows: jax.Array) -> jax.Array:
    """MSM over rows-layout points (3, L, N); scalars (N, 20) canonical.

    Returns a single projective point in rows layout (3, L, 1).
    """
    N = scalars.shape[0]
    digits = jnp.moveaxis(scalars, -1, 0)  # (20, N)

    def window_body(carry, dig):
        order = jnp.argsort(dig)
        dig_s = dig[order]
        pts_s = points_rows[:, :, order]
        buckets = bucket_sums(c, pts_s, dig_s)
        suffix = _chunked_prefix(c, buckets, reverse=True)
        total = _reduce_all(c, suffix[..., 1:])
        return carry, total

    _, window_sums = jax.lax.scan(window_body, 0, digits)  # (20, 3, L, 1)

    acc = window_sums[NLIMBS - 1]

    def horner(w, acc):
        for _ in range(LIMB_BITS):
            acc = pk.pdouble(c, acc)
        return pk.padd(c, acc, window_sums[NLIMBS - 2 - w])

    return jax.lax.fori_loop(0, NLIMBS - 1, horner, acc)


def msm(c: CurveSpec, scalars: jax.Array, points: jax.Array) -> jax.Array:
    """Drop-in for ops.msm.msm: (N,3,L) points -> (3,L) REP point."""
    rows_pts = pk.to_rows(points)
    out = msm_rows(c, scalars, rows_pts)
    return pk.from_rows(out)[0]
