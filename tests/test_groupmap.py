"""SvdW group map (kimchi to_group): host properties + device hint checks."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.curves import PALLAS, VESTA, groupmap as gm, host as hc
from mina_bridge_tpu.fields import ffl, host as fh
from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs


@pytest.mark.parametrize("curve", [PALLAS, VESTA], ids=lambda c: c.name)
def test_host_map_properties(curve, rng):
    gp = gm.params_for(curve)
    p = curve.base.p
    assert (gp.u**3 + curve.b) % p == gp.fu
    assert gp.sqrt_neg_three_u_squared**2 % p == (-3 * gp.u * gp.u) % p
    assert fh.legendre(curve.base, gp.nonsquare) == -1
    for t in [0, 1, p - 1] + [rng.randrange(p) for _ in range(25)]:
        pt, hints = gm.to_group_hints(curve, t)
        assert hc.is_on_curve(curve, pt)
        assert pt == gm.to_group(curve, t)
        assert pt[1] % 2 == 0  # even-root convention
        assert hints.sel in (0, 1, 2)
        # skipped branches really are non-square
        xs = gm.potential_xs(curve, t)
        for j in range(hints.sel):
            assert fh.legendre(curve.base, gm.curve_eqn(curve, xs[j])) == -1


def _dev_inputs(curve, ts):
    sel = np.zeros((len(ts), 3), np.int32)
    hint = np.zeros((len(ts), 4, NLIMBS), np.int32)
    pts = []
    for b, t in enumerate(ts):
        pt, uh = gm.to_group_hints(curve, t)
        pts.append(pt)
        sel[b, uh.sel] = 1
        hint[b, 0] = int_to_limbs(uh.y, NLIMBS)
        hint[b, 1] = int_to_limbs(uh.wits[0], NLIMBS)
        hint[b, 2] = int_to_limbs(uh.wits[1], NLIMBS)
        hint[b, 3] = int_to_limbs(uh.alpha, NLIMBS)
    t_rep = jnp.asarray(
        np.stack([int_to_limbs(t, ffl.REP_LIMBS) for t in ts]).astype(np.int32)
    )
    return t_rep, jnp.asarray(sel), jnp.asarray(hint), pts


def test_device_u_points_match_host(rng):
    curve = PALLAS
    ts = [0, 1] + [rng.randrange(curve.base.p) for _ in range(6)]
    t_rep, sel, hint, pts = _dev_inputs(curve, ts)
    u_aff, ok = gm.device_u_points(
        curve, t_rep, sel, hint[:, 0], hint[:, 1:3], hint[:, 3]
    )
    assert bool(jnp.all(ok))
    got = np.asarray(u_aff)
    for b, pt in enumerate(pts):
        assert [int(x) for x in got[b, 0]] == list(int_to_limbs(pt[0], NLIMBS))
        assert [int(x) for x in got[b, 1]] == list(int_to_limbs(pt[1], NLIMBS))


def test_device_rejects_bad_hints(rng):
    curve = PALLAS
    p = curve.base.p
    # ensure case 0 selects branch 0 (so "claim a later branch" tampers)
    ts = []
    while not ts:
        t = rng.randrange(p)
        if gm.to_group_hints(curve, t)[1].sel == 0:
            ts = [t] + [rng.randrange(p) for _ in range(3)]
    t_rep, sel, hint, pts = _dev_inputs(curve, ts)

    def check(sel_, hint_):
        _, ok = gm.device_u_points(
            curve, t_rep, sel_, hint_[:, 0], hint_[:, 1:3], hint_[:, 3]
        )
        return np.asarray(ok)

    assert check(sel, hint).all()
    # odd root: y -> p - y still squares to f(x) but fails the parity rule
    b = 0
    y = int(
        sum(int(v) << (13 * i) for i, v in enumerate(np.asarray(hint)[b, 0]))
    )
    hint_odd = hint.at[b, 0].set(jnp.asarray(int_to_limbs(p - y, NLIMBS)))
    assert not check(sel, hint_odd)[b]
    # wrong y entirely
    hint_bad = hint.at[b, 0].set(jnp.asarray(int_to_limbs(12345, NLIMBS)))
    assert not check(sel, hint_bad)[b]
    # claiming a later branch without valid non-squareness witnesses
    sel_shift = sel.at[b].set(jnp.asarray([0, 0, 1], jnp.int32))
    assert not check(sel_shift, hint)[b]
    # non-one-hot selector
    sel_two = sel.at[b].set(jnp.asarray([1, 1, 0], jnp.int32))
    assert not check(sel_two, hint)[b]
    # wrong alpha
    hint_alpha = hint.at[b, 3].set(jnp.asarray(int_to_limbs(7, NLIMBS)))
    assert not check(sel, hint_alpha)[b]
