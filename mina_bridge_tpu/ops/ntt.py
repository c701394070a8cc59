"""Number-theoretic transform over the Pasta scalar fields on device.

The FFT engine behind polynomial arithmetic (the host prover uses
kimchi/domain.py's python NTT; this is its batched device twin and the
groundwork for an on-device prover). Radix-2 DIT with per-stage
precomputed twiddle limb arrays: each stage is two lazy-field mul/add
waves over the full (batched) coefficient array — log2(n) stages, no
data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import ffl
from ..fields.params import FieldSpec, int_to_limbs
from ..kimchi.domain import Domain


@functools.cache
def _stage_twiddles(dom: Domain, inverse: bool) -> list[np.ndarray]:
    """Twiddle limb arrays per stage, aligned to the element layout.

    Stage s (block size 2m, m = 2^s): for lane j, the twiddle applied to
    the odd element is w_len^(j mod m) with w_len = root^(n / 2m).
    Returned per stage as an (n/2, L) array indexed by the odd-lane order.
    """
    p = dom.field.p
    n = dom.n
    root = dom.omega_inv if inverse else dom.omega
    out = []
    length = 2
    while length <= n:
        w_len = pow(root, n // length, p)
        half = length // 2
        tw = np.zeros((n // 2, ffl.REP_LIMBS), np.int32)
        idx = 0
        for start in range(0, n, length):
            w = 1
            for j in range(half):
                tw[idx] = int_to_limbs(w, ffl.REP_LIMBS)
                w = w * w_len % p
                idx += 1
        out.append(tw)
        length *= 2
    return out


@functools.cache
def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    out = np.zeros(n, np.int64)
    for i in range(n):
        r = 0
        x = i
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


def ntt(dom: Domain, coeffs: jax.Array, inverse: bool = False) -> jax.Array:
    """Batched NTT: coeffs (..., n, REP_LIMBS) -> evaluations (same shape).

    Matches kimchi/domain.fft / ifft bit-exactly (tested); inverse=True
    includes the 1/n scaling.
    """
    fs = dom.field
    n = dom.n
    assert coeffs.shape[-2] == n
    x = coeffs[..., jnp.asarray(_bitrev(n)), :]
    stages = _stage_twiddles(dom, inverse)
    half = 1
    for s, tw in enumerate(stages):
        length = half * 2
        # reshape into (..., n/length, length, L): evens/odds split
        shape = x.shape[:-2] + (n // length, length, ffl.REP_LIMBS)
        xr = x.reshape(shape)
        ev = xr[..., :half, :]
        od = xr[..., half:, :]
        twr = jnp.asarray(tw).reshape(n // length, half, ffl.REP_LIMBS)
        t = ffl.mul(fs, od, twr)
        x = jnp.concatenate(
            [ffl.add(fs, ev, t), ffl.sub(fs, ev, t)], axis=-2
        ).reshape(coeffs.shape)
        half = length
    if inverse:
        n_inv = ffl.from_int(fs, pow(n, fs.p - 2, fs.p))
        x = ffl.mul(fs, x, n_inv)
    return x
