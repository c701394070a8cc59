"""Lazy redundant field arithmetic vs host oracle, incl. adversarial chains."""

import jax
import jax.numpy as jnp
import pytest

from mina_bridge_tpu.fields import FP, FQ, ffl, host

SPECS = [FP, FQ]
N = 32


def rand_elems(rng, spec, n=N):
    xs = [rng.randrange(spec.p) for _ in range(n)]
    xs[:5] = [0, 1, spec.p - 1, spec.p - 2, (1 << 254) % spec.p]
    return xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_add_sub(rng, spec):
    xs, ys = rand_elems(rng, spec), rand_elems(rng, spec)
    a, b = ffl.from_ints(spec, xs), ffl.from_ints(spec, ys)

    mul = jax.jit(ffl.mul, static_argnums=0)
    assert ffl.to_ints(spec, mul(spec, a, b)) == [
        host.fmul(spec, x, y) for x, y in zip(xs, ys)
    ]
    assert ffl.to_ints(spec, ffl.add(spec, a, b)) == [
        host.fadd(spec, x, y) for x, y in zip(xs, ys)
    ]
    assert ffl.to_ints(spec, ffl.sub(spec, a, b)) == [
        host.fsub(spec, x, y) for x, y in zip(xs, ys)
    ]
    assert ffl.to_ints(spec, ffl.neg(spec, a)) == [host.fneg(spec, x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_canon_bit_exact(rng, spec):
    xs = rand_elems(rng, spec, 16)
    a = ffl.from_ints(spec, xs)
    c = jax.jit(ffl.canon, static_argnums=0)(spec, a)
    from mina_bridge_tpu.fields import ff

    assert ff.to_ints(c) == xs
    # canon of a redundant value (x + p represented loosely)
    b = ffl.add(spec, a, ffl.from_ints(spec, [0] * 16))
    b2 = ffl.mul(spec, a, ffl.ones(spec))
    assert ff.to_ints(ffl.canon(spec, b2)) == xs


def test_deep_chain(rng):
    """Long mixed op chains stay within REP bounds and stay correct."""
    spec = FP
    xs = rand_elems(rng, spec, 8)
    a = ffl.from_ints(spec, xs)
    hs = list(xs)

    def chain(a):
        for i in range(20):
            a2 = ffl.mul(spec, a, a)
            s = ffl.add(spec, a2, a)
            d = ffl.sub(spec, s, ffl.mul_small(spec, a, 15))
            a = ffl.add(spec, ffl.add(spec, d, d), ffl.sub(spec, d, a2))
        return a

    out = jax.jit(chain)(a)
    for i in range(20):
        h2 = [x * x % spec.p for x in hs]
        s = [(x2 + x) % spec.p for x2, x in zip(h2, hs)]
        d = [(si - 15 * x) % spec.p for si, x in zip(s, hs)]
        hs = [(2 * di + (di - x2)) % spec.p for di, x2 in zip(d, h2)]
    assert ffl.to_ints(spec, out) == hs


def test_pow_inv(rng):
    spec = FQ
    xs = rand_elems(rng, spec, 6)
    a = ffl.from_ints(spec, xs)
    assert ffl.to_ints(spec, ffl.pow_const(spec, a, 7)) == [
        host.fpow(spec, x, 7) for x in xs
    ]
    assert ffl.to_ints(spec, jax.jit(ffl.inv, static_argnums=0)(spec, a)) == [
        host.finv(spec, x) for x in xs
    ]


def test_square_matches_mul():
    """The dedicated triangular squaring conv (ffl.square / rows.square_r)
    is bit-identical to mul(a, a) across both layouts, including values
    near p and small values."""
    import random

    import jax.numpy as jnp
    import numpy as np

    from mina_bridge_tpu.fields import ffl, rows
    from mina_bridge_tpu.fields.params import FP

    rng = random.Random(0xACE)
    vals = [0, 1, 2, FP.p - 1, FP.p - 2] + [rng.randrange(FP.p) for _ in range(27)]
    a = ffl.from_ints(FP, vals)
    got = ffl.to_ints(FP, ffl.square(FP, a))
    assert got == [v * v % FP.p for v in vals]

    # rows layout (limbs-first): same inputs transposed
    ar = jnp.moveaxis(a, -1, 0)  # (L, B)
    got_r = rows.square_r(FP, ar)
    got_r = ffl.to_ints(FP, jnp.moveaxis(got_r, 0, -1))
    assert got_r == [v * v % FP.p for v in vals]


def test_inv_chain_kernel_interpret(rng, monkeypatch):
    """The Pallas fixed-exponent chain kernel (fields/chain_kernel.py,
    the TPU path for Fermat inversion) matches the host oracle via the
    Pallas interpreter on CPU, including a 2D batch shape and x == 0
    (inv(0) == 0 by Fermat)."""
    monkeypatch.setenv("MINA_BRIDGE_TPU_CHAIN_KERNEL", "interpret")
    spec = FQ
    xs = rand_elems(rng, spec, 5) + [0]
    a = ffl.from_ints(spec, xs).reshape(2, 3, -1)
    got = ffl.inv(spec, a).reshape(6, -1)
    assert ffl.to_ints(spec, got) == [host.finv(spec, x) for x in xs]
