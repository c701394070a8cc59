"""Curve ops: complete projective device formulas vs host affine oracle."""

import jax
import jax.numpy as jnp
import pytest

from mina_bridge_tpu.curves import PALLAS, VESTA, host as hc, jaxcurve as jc
from mina_bridge_tpu.fields import ff

CURVES = [PALLAS, VESTA]


def rand_points(rng, c, n):
    """Random points as small multiples of the generator."""
    return [hc.mul(c, rng.randrange(1, 1 << 64), c.generator) for _ in range(n)]


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_generator_on_curve(c):
    assert hc.is_on_curve(c, c.generator)
    # endo: phi(P) is on the curve and zeta^3 == 1
    assert pow(c.endo_base, 3, c.base.p) == 1 and c.endo_base != 1
    x, y = c.generator
    assert hc.is_on_curve(c, (x * c.endo_base % c.base.p, y))


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_add_double_vs_host(rng, c):
    pts = rand_points(rng, c, 6)
    qts = rand_points(rng, c, 6)
    # include edge cases: identity, doubling (p==q), inverse (p==-q)
    pts += [None, pts[0], pts[1]]
    qts += [qts[0], pts[0], hc.neg(c, pts[1])]
    dp = jc.from_affine_ints(c, pts)
    dq = jc.from_affine_ints(c, qts)
    got = jc.to_affine_ints(c, jax.jit(jc.add, static_argnums=0)(c, dp, dq))
    want = [hc.add(c, a, b) for a, b in zip(pts, qts)]
    assert got == want

    got_dbl = jc.to_affine_ints(c, jax.jit(jc.double, static_argnums=0)(c, dp))
    want_dbl = [hc.add(c, a, a) for a in pts]
    assert got_dbl == want_dbl


@pytest.mark.parametrize("c", CURVES, ids=lambda c: c.name)
def test_on_curve_check(rng, c):
    pts = rand_points(rng, c, 3) + [None]
    dp = jc.from_affine_ints(c, pts)
    assert jc.on_curve(c, dp).all()
    bad = dp.at[0, 0, 0].add(1)
    assert not jc.on_curve(c, bad)[0]


def test_scalar_mul_vs_host(rng):
    c = PALLAS
    ks = [rng.randrange(c.scalar.p) for _ in range(3)] + [0, 1]
    pts = rand_points(rng, c, 5)
    nbits = 255
    bits = jnp.asarray(
        [[(k >> (nbits - 1 - i)) & 1 for i in range(nbits)] for k in ks],
        dtype=jnp.int32,
    )
    dp = jc.from_affine_ints(c, pts)
    got = jc.to_affine_ints(
        c, jax.jit(jc.scalar_mul, static_argnums=0)(c, bits, dp)
    )
    want = [hc.mul(c, k, pt) for k, pt in zip(ks, pts)]
    assert got == want


def test_compress_roundtrip(rng):
    for c in CURVES:
        for pt in rand_points(rng, c, 4) + [None]:
            assert hc.decompress(c, hc.compress(c, pt)) == pt


def test_aff_to_rep_identity_not_absorbing(rng):
    """Regression (round 3): the affine (0,0) identity encoding must map
    to the projective representative (0:1:0). The all-zero (0:0:0)
    triple is an ABSORBING element of the complete RCB add (every output
    term has a zero factor, so P + (0,0,0) = (0,0,0)), which silently
    collapsed every verifier MSM containing an identity commitment row
    to "identity" — a full soundness bypass of the batched opening
    check."""
    import numpy as np

    from mina_bridge_tpu.commitment.ipa import aff_to_rep
    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs

    c = PALLAS
    (pt,) = rand_points(rng, c, 1)
    aff = np.zeros((2, 2, NLIMBS), np.int32)
    aff[0, 0] = int_to_limbs(pt[0], NLIMBS)
    aff[0, 1] = int_to_limbs(pt[1], NLIMBS)
    # aff[1] stays all-zero: the identity encoding
    rep = aff_to_rep(jnp.asarray(aff))
    # identity maps to (0:1:0), and P + identity == P through jc.add
    assert jc.to_affine_ints(c, rep) == [pt, None]
    s = jax.jit(jc.add, static_argnums=0)(c, rep[0], rep[1])
    assert jc.to_affine_ints(c, s[None]) == [pt]
    s2 = jax.jit(jc.add, static_argnums=0)(c, rep[1], rep[1])
    assert jc.to_affine_ints(c, s2[None]) == [None]
