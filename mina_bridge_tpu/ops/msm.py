"""Multi-scalar multiplication (Pippenger) as a data-parallel XLA program.

The dominant cost of IPA verification (reference README.md:469-475; the
Rust stack uses rayon-parallel Pippenger inside `poly-commitment`/`ark-ec`,
SURVEY §2c). TPU-native formulation:

* Window digits are the scalars' base-2^13 limbs — the canonical limb
  decomposition (fields/params.py) doubles as the Pippenger digit
  decomposition, so digit extraction is free: 20 windows of 13 bits.
* Bucket accumulation is sort + segmented scan: points sorted by digit
  (XLA sort), per-digit sums from a segmented Hillis-Steele scan whose
  combine is the branch-free complete point add — every lane does
  identical work.
* The weighted bucket sum uses the suffix-sum identity
  sum_d d*B_d = sum_{k>=1} (sum_{d>=k} B_d), again as scans.
* All scans are fori_loop-driven (log-step shifts), so each contributes
  exactly ONE point-add instance to the compiled graph: the whole MSM
  compiles to a handful of add/double instances regardless of N.
* Windows run under `lax.scan` (compile once, constant memory); the final
  combine is a 13-doubling Horner walk.

Sharding: `msm_sharded` splits the point axis across a mesh axis with
`shard_map`; each device reduces its shard and the D partial results are
combined with an all-gather + local tree add (group addition is not a
`psum`-able monoid over limb arrays, so the collective moves only D
partial points).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..curves.host import CurveSpec
from ..curves import jaxcurve as jc
from ..fields import ffl
from ..fields.params import LIMB_BITS, NLIMBS

__all__ = ["msm", "msm_sharded", "scalars_to_digits"]


def scalars_to_digits(scalars: jax.Array) -> jax.Array:
    """Canonical scalar limbs (N, 20) -> digits (20, N), msw last."""
    assert scalars.shape[-1] == NLIMBS
    return jnp.moveaxis(scalars, -1, 0)


def _shift_down(x: jax.Array, sh: jax.Array, fill: jax.Array) -> jax.Array:
    """y[i] = x[i - sh] for i >= sh else fill[i] (sh may be traced)."""
    n = x.shape[0]
    rolled = jnp.roll(x, sh, axis=0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    mask = idx >= sh
    return jnp.where(mask.reshape((n,) + (1,) * (x.ndim - 1)), rolled, fill)


def _segmented_scan(c: CurveSpec, pts: jax.Array, seg_start: jax.Array):
    """Inclusive segmented prefix point-sum along axis 0 (Hillis-Steele).

    One point-add instance in the graph; ceil(log2 N) runtime steps.
    """
    n = pts.shape[0]
    steps = max(1, math.ceil(math.log2(n)))
    ident = jnp.broadcast_to(jc.identity(c), pts.shape).astype(jnp.int32)

    def body(r, carry):
        x, f = carry
        sh = jnp.int32(1) << r
        px = _shift_down(x, sh, ident)
        pf = _shift_down(f.astype(jnp.int32), sh, jnp.ones((n,), jnp.int32))
        nx = jnp.where(f[:, None, None], x, jc.add(c, px, x))
        nf = f | (pf > 0)
        return nx, nf

    out, _ = jax.lax.fori_loop(0, steps, body, (pts, seg_start))
    return out


def _prefix_point_scan(c: CurveSpec, pts: jax.Array, reverse: bool = False):
    """Unsegmented inclusive prefix point-sum (Hillis-Steele), 1 instance."""
    if reverse:
        pts = jnp.flip(pts, axis=0)
    n = pts.shape[0]
    steps = max(1, math.ceil(math.log2(n)))
    ident = jnp.broadcast_to(jc.identity(c), pts.shape).astype(jnp.int32)

    def body(r, x):
        sh = jnp.int32(1) << r
        return jc.add(c, _shift_down(x, sh, ident), x)

    out = jax.lax.fori_loop(0, steps, body, pts)
    if reverse:
        out = jnp.flip(out, axis=0)
    return out


# Below this point count, a per-lane double-and-add (~2*255*N point-add
# lanes, no sort/scatter/buckets) beats the Pippenger formulation, whose
# bucket tail costs ~2 log(2^13) full waves over all 2^13 buckets per
# window regardless of N. The crossover is ~420 points; the difference at
# verifier-sized MSMs (N ~ a few hundred) is ~50x runtime.
SMALL_MSM_MAX = 384


def _msm_small(c: CurveSpec, scalars: jax.Array, points: jax.Array) -> jax.Array:
    """Per-lane double-and-add + tree reduce (small N; see SMALL_MSM_MAX)."""
    sh = jnp.arange(LIMB_BITS, dtype=jnp.int32)
    bits = (scalars[..., None] >> sh) & 1  # (N, 20, 13) lsb-first per limb
    bits = bits.reshape(scalars.shape[0], -1)[:, ::-1]  # msb-first
    per_lane = jc.scalar_mul(c, bits, points)  # (N, 3, L)
    return _prefix_point_scan(c, per_lane)[-1]


def msm(
    c: CurveSpec,
    scalars: jax.Array,
    points: jax.Array,
    window_bits: int = LIMB_BITS,
) -> jax.Array:
    """MSM sum_i scalars[i] * points[i].

    scalars: (N, NLIMBS) canonical limbs of the scalar field.
    points:  (N, 3, REP_LIMBS) projective REP.
    Returns one projective REP point (3, REP_LIMBS).
    """
    assert window_bits == LIMB_BITS, "windows are the 13-bit limb digits"
    if scalars.shape[0] <= SMALL_MSM_MAX:
        return _msm_small(c, scalars, points)
    digits = scalars_to_digits(scalars)  # (20, N)
    nbuckets = 1 << LIMB_BITS

    def window_body(carry, dig):
        order = jnp.argsort(dig)
        dig_s = dig[order]
        pts_s = points[order]
        seg_start = jnp.concatenate(
            [jnp.ones((1,), bool), dig_s[1:] != dig_s[:-1]]
        )
        seg_end = jnp.concatenate(
            [dig_s[1:] != dig_s[:-1], jnp.ones((1,), bool)]
        )
        prefix = _segmented_scan(c, pts_s, seg_start)
        # scatter segment totals into buckets; digit 0 and non-ends -> dump
        idx = jnp.where(seg_end & (dig_s != 0), dig_s, nbuckets)
        buckets = jnp.broadcast_to(
            jc.identity(c), (nbuckets + 1, 3, ffl.REP_LIMBS)
        ).astype(jnp.int32)
        buckets = buckets.at[idx].set(prefix)[:nbuckets]
        # weighted sum: suffix sums T_k, then sum_{k>=1} T_k
        suffix = _prefix_point_scan(c, buckets, reverse=True)
        total = _prefix_point_scan(c, suffix[1:])[-1]
        return carry, total

    _, window_sums = jax.lax.scan(window_body, 0, digits)  # (20, 3, L)

    # Horner: S = ((S_19 * 2^13 + S_18) * 2^13 + ...) + S_0
    acc = window_sums[NLIMBS - 1]

    def horner(w, acc):
        for _ in range(LIMB_BITS):
            acc = jc.double(c, acc)
        return jc.add(c, acc, window_sums[NLIMBS - 2 - w])

    return jax.lax.fori_loop(0, NLIMBS - 1, horner, acc)


def msm_sharded(
    c: CurveSpec,
    scalars: jax.Array,
    points: jax.Array,
    mesh: jax.sharding.Mesh,
    axis: str = "shard",
) -> jax.Array:
    """MSM with the point/scalar axis sharded over `mesh[axis]`.

    Each device runs a local Pippenger over its shard; the D partial
    results are all-gathered and tree-added identically on every device.
    """
    from jax.sharding import PartitionSpec as P

    def local(sc, pt):
        part = msm(c, sc, pt)[None]  # (1, 3, L)
        parts = jax.lax.all_gather(part, axis, axis=0, tiled=True)  # (D, 3, L)
        return _prefix_point_scan(c, parts)[-1]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(scalars, points)
