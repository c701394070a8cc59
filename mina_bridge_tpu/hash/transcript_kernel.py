"""Whole-transcript Poseidon as ONE Pallas TPU kernel.

The verifier's Fiat-Shamir transcripts (kimchi FQ/FR + the IPA
continuation, reference README.md:409-475) are an inherently sequential
chain of ~150+ Poseidon permutations. The lax.scan formulation executes
each 55-round permutation as thousands of tiny fused XLA ops on
(B, 3, 22) tensors — per-op overhead, not arithmetic, dominates
(measured 84% of the 2^16 B=32 verify wall time, BENCH_r04).

This kernel runs the ENTIRE absorb/permute schedule in one pallas_call:
grid = (T permutation blocks,), sponge state carried across the
sequential TPU grid in a VMEM scratch buffer, the 55 rounds as a
fori_loop inside the kernel body. All field math is the shared
limbs-first rows.py machinery (identical bounds/semantics to the ffl
path used by the lax.scan formulation — values agree exactly after
canonicalization).

Layout: state (3, L, B) — poseidon words x limbs(sublanes) x
batch(lanes); round constants / MDS ride as lane-broadcast operands
(kernels must not capture array constants); in matrix-fold mode the
(20, 31) fold matrix is an explicit operand pushed via rows.fold_ctx.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import rows
from ..fields.ffl import REP_LIMBS, _fold_mode
from ..fields.params import int_to_limbs
from .poseidon_params import RATE, WIDTH, PoseidonSpec

__all__ = ["transcript_blocks", "use_kernel"]


def use_kernel() -> bool:
    return jax.default_backend() not in ("cpu",)


@functools.cache
def _rc_mds_operands(ps: PoseidonSpec):
    """(55, WIDTH, L, 1) round constants and (WIDTH, WIDTH, L, 1) MDS in
    rows layout with a broadcastable singleton lane axis."""
    nr = len(ps.round_constants)
    rc = np.zeros((nr, WIDTH, REP_LIMBS, 1), dtype=np.int32)
    for r, row in enumerate(ps.round_constants):
        for i, c in enumerate(row):
            rc[r, i, :, 0] = int_to_limbs(c, REP_LIMBS)
    mds = np.zeros((WIDTH, WIDTH, REP_LIMBS, 1), dtype=np.int32)
    for i in range(WIDTH):
        for j in range(WIDTH):
            mds[i, j, :, 0] = int_to_limbs(ps.mds[i][j], REP_LIMBS)
    return rc, mds


def _permute_body(ps: PoseidonSpec, st: jax.Array, rc_ref, mds) -> jax.Array:
    """55 rounds on a (WIDTH, L, B) rows-layout state (fori_loop).

    rc_ref is a REF (not a value): Mosaic has no dynamic_slice on
    values, but dynamic ref loads on leading (untiled) dims lower fine.
    """
    f = ps.field
    nr = rc_ref.shape[0]

    def round_body(r, st):
        # sbox x^7 = ((x^2 * x)^2) * x on all WIDTH words at once
        x2 = rows.square_r(f, st)
        x3 = rows.mul_r(f, x2, st)
        x6 = rows.square_r(f, x3)
        st = rows.mul_r(f, x6, st)
        # MDS as one broadcast multiply + 2-add tree (matches permute())
        prod = rows.mul_r(f, mds, st[None])  # (WIDTH, WIDTH, L, B)
        acc = prod[:, 0]
        for j in range(1, WIDTH):
            acc = rows.add_r(f, acc, prod[:, j])
        rc_r = rc_ref[pl.ds(r, 1)][0]  # (WIDTH, L, 1)
        return rows.add_r(f, acc, rc_r)

    return jax.lax.fori_loop(0, nr, round_body, st)


def _kernel_factory(ps: PoseidonSpec, use_mat: bool):
    def kernel(*refs):
        # refs: [cmat?] rc mds init adds out scratch
        off = 1 if use_mat else 0
        rc_ref, mds_ref, init_ref, adds_ref = refs[off : off + 4]
        out_ref, st_ref = refs[off + 4], refs[off + 5]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            st_ref[:] = init_ref[:]

        ctx = rows.fold_ctx(refs[0][:]) if use_mat else None
        if ctx is not None:
            ctx.__enter__()
        try:
            st = st_ref[:]
            add_blk = adds_ref[0]  # (RATE, L, B)
            absorbed = rows.add_r(ps.field, st[:RATE], add_blk)
            st = jnp.concatenate([absorbed, st[RATE:]], axis=0)
            st = _permute_body(ps, st, rc_ref, mds_ref[:])
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
        st_ref[:] = st
        out_ref[0] = st

    return kernel


def transcript_blocks(
    ps: PoseidonSpec,
    state: jax.Array,
    adds: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Run T pre-scheduled permutation blocks in one kernel.

    state: (..., WIDTH, L) initial sponge state (ffl limbs-last layout).
    adds:  (T, RATE, ..., L) pre-permute additions per block.
    Returns all_states (T, ..., WIDTH, L) — the state after each block,
    bit-identical (mod p, post-canon) to the lax.scan path.
    """
    bshape = state.shape[:-2]
    L = state.shape[-1]
    assert L == REP_LIMBS
    T = adds.shape[0]
    Bn = int(np.prod(bshape, dtype=np.int64)) if bshape else 1

    # ffl (..., W, L) -> rows (W, L, B)
    st_r = jnp.transpose(state.reshape(Bn, WIDTH, L), (1, 2, 0))
    adds_r = jnp.transpose(adds.reshape(T, RATE, Bn, L), (0, 1, 3, 2))

    rc_np, mds_np = _rc_mds_operands(ps)
    use_mat = _fold_mode() == "matrix"
    cmat_in = (jnp.asarray(rows.fold_matrix_T(ps.field)),) if use_mat else ()

    def full(shape):
        return pl.BlockSpec(
            shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    in_specs = (
        ([pl.BlockSpec((20, rows.FOLD_MAT_ROWS), lambda t: (0, 0), memory_space=pltpu.VMEM)] if use_mat else [])
        + [
            full(rc_np.shape),
            full(mds_np.shape),
            full((WIDTH, L, Bn)),
            pl.BlockSpec(
                (1, RATE, L, Bn), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ]
    )
    out = pl.pallas_call(
        _kernel_factory(ps, use_mat),
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, WIDTH, L, Bn), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((T, WIDTH, L, Bn), jnp.int32),
        scratch_shapes=[pltpu.VMEM((WIDTH, L, Bn), jnp.int32)],
        interpret=interpret,
    )(*cmat_in, jnp.asarray(rc_np), jnp.asarray(mds_np), st_r, adds_r)

    # rows (T, W, L, B) -> ffl (T, ..., W, L)
    return jnp.transpose(out, (0, 3, 1, 2)).reshape((T,) + bshape + (WIDTH, L))
