"""Device NTT vs host FFT (bit-exact), forward/inverse roundtrip."""

import jax
import pytest

from mina_bridge_tpu.curves import PALLAS
from mina_bridge_tpu.fields import ffl
from mina_bridge_tpu.kimchi.domain import Domain, fft, ifft
from mina_bridge_tpu.ops.ntt import ntt

FS = PALLAS.scalar


def test_ntt_matches_host(rng):
    dom = Domain(FS, 4)
    coeffs = [rng.randrange(FS.p) for _ in range(dom.n)]
    dev = ffl.from_ints(FS, coeffs)
    out = jax.jit(ntt, static_argnums=(0, 2))(dom, dev)
    assert ffl.to_ints(FS, out) == fft(dom, coeffs)
    back = ntt(dom, out, inverse=True)
    assert ffl.to_ints(FS, back) == coeffs
    assert ifft(dom, fft(dom, coeffs)) == coeffs


def test_ntt_batched(rng):
    dom = Domain(FS, 3)
    import jax.numpy as jnp

    batches = [[rng.randrange(FS.p) for _ in range(dom.n)] for _ in range(3)]
    dev = jnp.stack([ffl.from_ints(FS, b) for b in batches])
    out = ntt(dom, dev)
    for i, b in enumerate(batches):
        assert ffl.to_ints(FS, out[i]) == fft(dom, b)
