"""Shallue–van de Woestijne group map (kimchi's `to_group`).

The reference's `poly-commitment` crate derives each opening proof's
blinding group element U deterministically from a transcript challenge t
via the SvdW map (the o1-labs `groupmap` crate; consumed by kimchi's
`batch_verify` — SURVEY §2b, README.md:469-475). This module implements
the same map for the TPU framework, replacing the earlier U = t*J
deviation (PARITY D1).

Map (curves y^2 = x^3 + b, parameter u fixed at setup):
    f(x)  = x^3 + b
    alpha = 1 / (t^2 (t^2 + f(u)))              (0 when the inverse
                                                 does not exist)
    x1 = (sqrt(-3u^2) - u)/2 - t^4 alpha sqrt(-3u^2)
    x2 = -u - x1
    x3 = u - (t^2 + f(u))^3 alpha / (3u^2)
    to_group(t) = (x_i, sqrt(f(x_i))) for the FIRST i with f(x_i) square.

Setup picks the least u >= 1 with f(u) != 0 (Pasta primes are 1 mod 3,
so -3u^2 is always square). The y root is canonicalized to the EVEN
root (y mod 2 == 0) — the root choice never enters the transcript, so
this is a free convention; swap at the data-drop layer if the Rust
stack's arkworks root differs (PARITY §Data).

TPU strategy: the device never computes sqrt/Legendre. The host supplies
verifiable hints — the branch index, the even root y, non-squareness
witnesses w_j with w_j^2 = g_ns f(x_j) for each skipped branch j (g_ns a
fixed non-square), and alpha. The device recomputes x1/x2/x3 (a handful
of multiplies), then validates every hint by squaring, so soundness
never rests on the hints.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import ffl, host as fh
from ..fields.params import NLIMBS, FieldSpec, int_to_limbs
from .host import CurveSpec


@dataclasses.dataclass(frozen=True)
class GroupMapParams:
    u: int
    fu: int  # f(u) = u^3 + b
    sqrt_neg_three_u_squared: int
    sqrt_neg_three_u_squared_minus_u_over_2: int
    inv_three_u_squared: int
    nonsquare: int  # least quadratic non-residue (witness base g_ns)


@functools.cache
def params_for(curve: CurveSpec) -> GroupMapParams:
    fb = curve.base
    p = fb.p
    u = 1
    while (u * u * u + curve.b) % p == 0:
        u += 1
    fu = (u * u * u + curve.b) % p
    three_u2 = 3 * u * u % p
    s = fh.fsqrt(fb, (-three_u2) % p)
    assert s is not None, "p must be 1 mod 3 for the SvdW map"
    if s % 2:
        s = p - s  # even-root convention, matches to_group's y choice
    nonsquare = 2
    while fh.legendre(fb, nonsquare) != -1:
        nonsquare += 1
    return GroupMapParams(
        u=u,
        fu=fu,
        sqrt_neg_three_u_squared=s,
        sqrt_neg_three_u_squared_minus_u_over_2=(s - u)
        * pow(2, p - 2, p)
        % p,
        inv_three_u_squared=pow(three_u2, p - 2, p),
        nonsquare=nonsquare,
    )


def potential_xs(curve: CurveSpec, t: int) -> tuple[int, int, int]:
    """The three x-candidates for challenge t (host big-int)."""
    gp = params_for(curve)
    p = curve.base.p
    t2 = t * t % p
    d = t2 * (t2 + gp.fu) % p
    alpha = pow(d, p - 2, p) if d else 0
    x1 = (
        gp.sqrt_neg_three_u_squared_minus_u_over_2
        - t2 * t2 % p * alpha % p * gp.sqrt_neg_three_u_squared
    ) % p
    x2 = (-gp.u - x1) % p
    t2fu = (t2 + gp.fu) % p
    x3 = (gp.u - t2fu * t2fu % p * t2fu % p * alpha % p * gp.inv_three_u_squared) % p
    return x1, x2, x3


def curve_eqn(curve: CurveSpec, x: int) -> int:
    return (x * x % curve.base.p * x + curve.b) % curve.base.p


def to_group(curve: CurveSpec, t: int) -> tuple[int, int]:
    """First candidate with square f(x); y is the even root."""
    p = curve.base.p
    for x in potential_xs(curve, t):
        y = fh.fsqrt(curve.base, curve_eqn(curve, x))
        if y is not None:
            if y % 2:
                y = p - y
            return (x, y)
    raise AssertionError("SvdW: no candidate was square (impossible)")


@dataclasses.dataclass
class UHints:
    """Verifiable witness data for one to_group evaluation."""

    sel: int  # branch index 0/1/2
    y: int  # even root of f(x_sel)
    wits: tuple[int, int]  # w_j with w_j^2 = g_ns f(x_j) for skipped j
    alpha: int  # 1/(t^2 (t^2 + fu)) or 0


def to_group_hints(curve: CurveSpec, t: int) -> tuple[tuple[int, int], UHints]:
    """to_group(t) plus the device-checkable hint bundle."""
    gp = params_for(curve)
    fb = curve.base
    p = fb.p
    t2 = t * t % p
    d = t2 * (t2 + gp.fu) % p
    alpha = pow(d, p - 2, p) if d else 0
    xs = potential_xs(curve, t)
    wits = [0, 0]
    for i, x in enumerate(xs):
        y = fh.fsqrt(fb, curve_eqn(curve, x))
        if y is not None:
            if y % 2:
                y = p - y
            return (x, y), UHints(
                sel=i, y=y, wits=(wits[0], wits[1]), alpha=alpha
            )
        w = fh.fsqrt(fb, gp.nonsquare * curve_eqn(curve, x) % p)
        assert w is not None
        wits[i] = w
    raise AssertionError("SvdW: no candidate was square (impossible)")


# ---------------------------------------------------------------------------
# Device side: recompute candidates, validate hints by squaring
# ---------------------------------------------------------------------------

def device_u_points(
    curve: CurveSpec,
    t_rep: jax.Array,  # (B, REP_LIMBS) base-field challenge
    u_sel: jax.Array,  # (B, 3) int32 one-hot branch
    u_y: jax.Array,  # (B, NLIMBS) canonical even root
    u_wits: jax.Array,  # (B, 2, NLIMBS) canonical non-square witnesses
    u_alpha: jax.Array,  # (B, NLIMBS) canonical alpha
) -> tuple[jax.Array, jax.Array]:
    """Validated U points for a batch of transcript challenges.

    Returns (u_affine (B, 2, NLIMBS) canonical, ok (B,) bool). ok fails
    unless: sel is one-hot; alpha * t^2(t^2+fu) == 1 (or both zero);
    y^2 == f(x_sel) with y even; and w_j^2 == g_ns * f(x_j) for every
    branch j before sel (proving f(x_j) non-square, i.e. sel is the
    FIRST square branch — exactly to_group's semantics).
    """
    gp = params_for(curve)
    fb = curve.base
    mul = lambda a, b: ffl.mul(fb, a, b)
    add = lambda a, b: ffl.add(fb, a, b)
    sub = lambda a, b: ffl.sub(fb, a, b)

    def c(v: int) -> jax.Array:
        return jnp.asarray(int_to_limbs(v % fb.p, ffl.REP_LIMBS))

    B = t_rep.shape[0]
    one = jnp.broadcast_to(ffl.ones(fb), (B, ffl.REP_LIMBS)).astype(jnp.int32)
    alpha = ffl.from_canon(u_alpha)
    t2 = mul(t_rep, t_rep)
    t2fu = add(t2, jnp.broadcast_to(c(gp.fu), t2.shape).astype(jnp.int32))
    d = mul(t2, t2fu)
    alpha_ok = jnp.logical_or(
        ffl.is_zero(fb, sub(mul(alpha, d), one)),
        jnp.logical_and(ffl.is_zero(fb, d), ffl.is_zero(fb, alpha)),
    )

    x1 = sub(
        jnp.broadcast_to(
            c(gp.sqrt_neg_three_u_squared_minus_u_over_2), t2.shape
        ).astype(jnp.int32),
        mul(mul(mul(t2, t2), alpha), c(gp.sqrt_neg_three_u_squared)[None]),
    )
    x2 = sub(
        jnp.broadcast_to(c(-gp.u % fb.p), t2.shape).astype(jnp.int32), x1
    )
    x3 = sub(
        jnp.broadcast_to(c(gp.u), t2.shape).astype(jnp.int32),
        mul(
            mul(mul(mul(t2fu, t2fu), t2fu), alpha),
            c(gp.inv_three_u_squared)[None],
        ),
    )
    xs = jnp.stack([x1, x2, x3], axis=1)  # (B, 3, REP)
    fx = add(
        mul(mul(xs, xs), xs),
        jnp.broadcast_to(c(curve.b), xs.shape).astype(jnp.int32),
    )  # (B, 3, REP)

    sel = u_sel.astype(jnp.int32)
    sel_ok = jnp.logical_and(
        jnp.sum(sel, axis=1) == 1,
        jnp.all(jnp.logical_or(sel == 0, sel == 1), axis=1),
    )
    # x_sel via masked sum (one-hot)
    x_sel = jnp.sum(xs * sel[:, :, None], axis=1)
    fx_sel = jnp.sum(fx * sel[:, :, None], axis=1)

    y = ffl.from_canon(u_y)
    y_ok = ffl.is_zero(fb, sub(mul(y, y), fx_sel))
    y_even = (u_y[:, 0] & 1) == 0

    # skipped-branch witnesses: branch j is "before sel" iff sel has a 1
    # strictly after j. need[j] = sum_{i>j} sel[i]
    need0 = sel[:, 1] + sel[:, 2]
    need1 = sel[:, 2]
    g_ns = jnp.broadcast_to(c(gp.nonsquare), t2.shape).astype(jnp.int32)
    w = ffl.from_canon(u_wits)  # (B, 2, REP)
    wit0_ok = ffl.is_zero(
        fb, sub(mul(w[:, 0], w[:, 0]), mul(g_ns, fx[:, 0]))
    )
    wit1_ok = ffl.is_zero(
        fb, sub(mul(w[:, 1], w[:, 1]), mul(g_ns, fx[:, 1]))
    )
    wits_ok = jnp.logical_and(
        jnp.logical_or(need0 == 0, wit0_ok),
        jnp.logical_or(need1 == 0, wit1_ok),
    )

    ok = alpha_ok & sel_ok & y_ok & y_even & wits_ok
    u_aff = jnp.stack([ffl.canon(fb, x_sel), u_y], axis=1)  # (B, 2, NLIMBS)
    return u_aff, ok
