"""Poseidon: device batched permutation/sponge vs host oracle (bit-exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.fields import FP, ff
from mina_bridge_tpu.hash import poseidon
from mina_bridge_tpu.hash.poseidon_params import WIDTH, poseidon_spec


@pytest.mark.parametrize("field_name", ["fp", "fq"])
def test_permute_matches_host(rng, field_name):
    ps = poseidon_spec(field_name)
    B = 4
    states = [[rng.randrange(ps.field.p) for _ in range(WIDTH)] for _ in range(B)]
    from mina_bridge_tpu.fields import ffl

    dev = jnp.stack(
        [ffl.from_ints(ps.field, s) for s in states]
    )  # (B, 3, REP_LIMBS)
    out = jax.jit(poseidon.permute, static_argnums=0)(ps, dev)
    for b in range(B):
        got = ffl.to_ints(ps.field, out[b])
        want = poseidon.host_permute(ps, states[b])
        assert got == want


@pytest.mark.parametrize("n", [0, 1, 2, 3, 5])
def test_hash_fixed_matches_host_sponge(rng, n):
    ps = poseidon_spec("fp")
    B = 3
    batches = [[rng.randrange(ps.field.p) for _ in range(n)] for _ in range(B)]
    if n:
        dev = jnp.stack([ff.from_ints(ps.field, xs) for xs in batches])
    else:
        dev = ff.zeros(ps.field, (B, 0))
    out = jax.jit(poseidon.hash_fixed, static_argnums=0)(ps, dev)
    for b in range(B):
        assert ff.to_ints(out[b])[0] == poseidon.host_hash(ps, batches[b])


def test_device_sponge_transcript(rng):
    """Interleaved absorb/squeeze transcript matches host sponge."""
    ps = poseidon_spec("fq")
    xs = [rng.randrange(ps.field.p) for _ in range(5)]
    dsp = poseidon.Sponge(ps)
    hsp = poseidon.HostSponge(ps)
    for x in xs[:3]:
        dsp.absorb(ff.from_int(ps.field, x))
        hsp.absorb(x)
    assert ff.to_int(dsp.squeeze()) == hsp.squeeze()
    assert ff.to_int(dsp.squeeze()) == hsp.squeeze()
    for x in xs[3:]:
        dsp.absorb(ff.from_int(ps.field, x))
        hsp.absorb(x)
    assert ff.to_int(dsp.squeeze()) == hsp.squeeze()


def test_params_deterministic():
    a = poseidon_spec("fp")
    b = poseidon_spec("fp")
    assert a.round_constants == b.round_constants and a.mds == b.mds
    assert len(a.round_constants) == 55
