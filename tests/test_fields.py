"""Field arithmetic: device limb ops vs host big-int oracle (bit-exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.fields import FP, FQ, ff, host

SPECS = [FP, FQ]
N = 64


def rand_elems(rng, spec, n=N, edge=True):
    xs = [rng.randrange(spec.p) for _ in range(n)]
    if edge:
        xs[:6] = [0, 1, 2, spec.p - 1, spec.p - 2, (1 << 254) % spec.p]
    return xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip(rng, spec):
    xs = rand_elems(rng, spec)
    assert ff.to_ints(ff.from_ints(spec, xs)) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(rng, spec):
    xs, ys = rand_elems(rng, spec), rand_elems(rng, spec)
    a, b = ff.from_ints(spec, xs), ff.from_ints(spec, ys)
    assert ff.to_ints(jax.jit(ff.add, static_argnums=0)(spec, a, b)) == [
        host.fadd(spec, x, y) for x, y in zip(xs, ys)
    ]
    assert ff.to_ints(jax.jit(ff.sub, static_argnums=0)(spec, a, b)) == [
        host.fsub(spec, x, y) for x, y in zip(xs, ys)
    ]
    assert ff.to_ints(jax.jit(ff.neg, static_argnums=0)(spec, a)) == [
        host.fneg(spec, x) for x in xs
    ]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(rng, spec):
    xs, ys = rand_elems(rng, spec), rand_elems(rng, spec)
    a, b = ff.from_ints(spec, xs), ff.from_ints(spec, ys)
    got = ff.to_ints(jax.jit(ff.mul, static_argnums=0)(spec, a, b))
    assert got == [host.fmul(spec, x, y) for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_worst_case(spec):
    """Maximal operands stress the reduction bounds."""
    xs = [spec.p - 1] * 8 + [spec.p - 2, (1 << 254) - 1]
    a = ff.from_ints(spec, xs)
    got = ff.to_ints(ff.mul(spec, a, a))
    assert got == [host.fmul(spec, x, x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pow_inv(rng, spec):
    xs = rand_elems(rng, spec, n=8)
    a = ff.from_ints(spec, xs)
    assert ff.to_ints(ff.pow_const(spec, a, 7)) == [
        host.fpow(spec, x, 7) for x in xs
    ]
    got_inv = ff.to_ints(jax.jit(ff.inv, static_argnums=0)(spec, a))
    assert got_inv == [host.finv(spec, x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_batch_inv(rng, spec):
    xs = rand_elems(rng, spec, n=16)
    xs[3] = 0  # zero maps to zero
    a = ff.from_ints(spec, xs)
    got = ff.to_ints(jax.jit(ff.batch_inv, static_argnums=0)(spec, a))
    assert got == [host.finv(spec, x) for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul_const(rng, spec):
    xs = rand_elems(rng, spec, n=8)
    a = ff.from_ints(spec, xs)
    c = 0xDEADBEEFCAFE
    assert ff.to_ints(ff.mul_const(spec, a, c)) == [
        host.fmul(spec, x, c) for x in xs
    ]


def test_host_sqrt():
    for spec in SPECS:
        for v in [4, 9, 2, 5, spec.p - 1]:
            r = host.fsqrt(spec, v)
            if r is not None:
                assert r * r % spec.p == v % spec.p
        # squares always have roots
        for x in [3, 12345, spec.p - 7]:
            sq = x * x % spec.p
            r = host.fsqrt(spec, sq)
            assert r is not None and r * r % spec.p == sq


def test_vmap_and_shapes(rng):
    xs = rand_elems(rng, FP, n=12)
    a = ff.from_ints(FP, xs).reshape(3, 4, -1)
    out = ff.mul(FP, a, a)
    assert out.shape == a.shape
    flat = ff.to_ints(out.reshape(12, -1))
    assert flat == [host.fmul(FP, x, x) for x in xs]
