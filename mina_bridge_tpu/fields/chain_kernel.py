"""Fixed-exponent power chains (Fermat inversion) as one Pallas kernel.

ffl.pow_const's lax.scan runs ~254 sequential square/mul steps as
thousands of tiny fused XLA ops — after the transcript kernel landed,
these chains are the next-largest slice of the batched verify's
sequential critical path (Lagrange-denominator + IPA challenge
inversions). This kernel runs the whole square-and-multiply ladder in
one pallas_call: a fori_loop over the exponent bits (bit pattern rides
as an SMEM operand; branchless select), field math via the shared
limbs-first rows.py machinery — same reduce/bounds as the ffl path, so
values agree exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rows
from .ffl import REP_LIMBS, _fold_mode
from .params import FieldSpec

__all__ = ["pow_const_rows", "use_kernel"]


def use_kernel() -> bool:
    return jax.default_backend() not in ("cpu",)


def _kernel_factory(spec: FieldSpec, nbits: int, use_mat: bool):
    def kernel(*refs):
        off = 1 if use_mat else 0
        bits_ref, x_ref = refs[off], refs[off + 1]
        out_ref = refs[off + 2]
        ctx = rows.fold_ctx(refs[0][:]) if use_mat else None
        if ctx is not None:
            ctx.__enter__()
        try:
            x = x_ref[:]

            def body(r, acc):
                acc = rows.square_r(spec, acc)
                m = rows.mul_r(spec, acc, x)
                bit = bits_ref[r, 0]
                return jnp.where(bit != 0, m, acc)

            out_ref[:] = jax.lax.fori_loop(0, nbits, body, x)
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)

    return kernel


def pow_const_rows(
    spec: FieldSpec, x: jax.Array, e: int, interpret: bool = False
) -> jax.Array:
    """x^e on ffl-layout (..., REP_LIMBS) input, e >= 1 a Python int.

    Matches ffl.pow_const semantics (square-and-multiply, msb-first,
    starting from acc = x after the leading 1 bit).
    """
    assert e >= 1
    bshape = x.shape[:-1]
    L = x.shape[-1]
    assert L == REP_LIMBS
    Bn = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    bits = [(e >> i) & 1 for i in reversed(range(e.bit_length()))][1:]
    nbits = len(bits)
    if nbits == 0:
        return x
    bits_np = np.asarray(bits, np.int32).reshape(nbits, 1)

    xr = jnp.transpose(x.reshape(Bn, L), (1, 0))  # (L, B)
    use_mat = _fold_mode() == "matrix"
    cmat_in = (jnp.asarray(rows.fold_matrix_T(spec)),) if use_mat else ()
    in_specs = (
        (
            [
                pl.BlockSpec(
                    (20, rows.FOLD_MAT_ROWS),
                    lambda: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            if use_mat
            else []
        )
        + [
            pl.BlockSpec((nbits, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, Bn), lambda: (0, 0), memory_space=pltpu.VMEM),
        ]
    )
    out = pl.pallas_call(
        _kernel_factory(spec, nbits, use_mat),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, Bn), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, Bn), jnp.int32),
        interpret=interpret,
    )(*cmat_in, jnp.asarray(bits_np), xr)
    return jnp.transpose(out, (1, 0)).reshape(bshape + (L,))
