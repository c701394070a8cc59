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


def _host_transcript(ps, plan, xs):
    """Drive HostSponge with the ('absorb'|'squeeze') plan; return squeezes."""
    hsp = poseidon.HostSponge(ps)
    it = iter(xs)
    out = []
    for op in plan:
        if op == "absorb":
            hsp.absorb(next(it))
        else:
            out.append(hsp.squeeze())
    return out


@pytest.mark.parametrize("mode", ["off", "interpret"])
def test_run_transcript_matches_host(rng, mode, monkeypatch):
    """The scheduled-scan path AND the Pallas whole-transcript kernel
    (interpret mode on CPU) both match the host sponge bit-exactly on an
    irregular absorb/squeeze schedule, including a continuation sponge
    with trailing un-permuted absorbs."""
    monkeypatch.setenv("MINA_BRIDGE_TPU_TRANSCRIPT_KERNEL", mode)
    ps = poseidon_spec("fq")
    B = 3
    plan = (
        ["absorb"] * 3 + ["squeeze"] * 2 + ["absorb"] * 4 + ["squeeze"]
        + ["absorb"] * 2 + ["squeeze"] * 3 + ["absorb"]  # trailing absorb
    )
    n_abs = plan.count("absorb")
    vals = [
        [rng.randrange(ps.field.p) for _ in range(B)] for _ in range(n_abs)
    ]
    ops = []
    it = iter(vals)
    for op in plan:
        if op == "absorb":
            ops.append(("absorb", ff.from_ints(ps.field, next(it))))
        else:
            ops.append(("squeeze",))
    sq, cont = poseidon.run_transcript(ps, ops, batch_shape=(B,))
    # continuation: squeeze once more through the stateful sponge
    extra = cont.squeeze()
    for b in range(B):
        want = _host_transcript(
            ps, plan, [vals[i][b] for i in range(n_abs)]
        )
        got = [ff.to_ints(s)[b] for s in sq]
        assert got == want, f"squeeze mismatch lane {b} mode {mode}"
        hsp = poseidon.HostSponge(ps)
        it2 = iter([vals[i][b] for i in range(n_abs)])
        for op in plan:
            if op == "absorb":
                hsp.absorb(next(it2))
            else:
                hsp.squeeze()
        assert ff.to_ints(extra)[b] == hsp.squeeze()
