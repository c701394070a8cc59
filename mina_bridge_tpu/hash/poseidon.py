"""Poseidon permutation and sponge (kimchi shape) — batched TPU + host.

Structure follows kimchi's poseidon (width 3, rate 2, 55 full rounds,
x^7 sbox, no initial ARK): each round applies sbox to every lane, then the
MDS matrix, then adds that round's constants. This is the Fiat-Shamir
oracle and Mina's state/account hash (reference README.md:407-475; the
reference consumes it from the pinned `mina-poseidon` crate,
Cargo.lock:3776-3791).

Device API operates on batches: state has shape (..., 3, NLIMBS); one
permutation is a lax.scan over the 55 rounds, fully vectorized over the
batch, so hashing 16 protocol states or thousands of accounts costs one
permutation stream.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import ff, ffl
from ..fields.params import NLIMBS, FieldSpec, int_to_limbs
from . import transcript_kernel
from .poseidon_params import RATE, WIDTH, PoseidonSpec, poseidon_spec


def _transcript_kernel_mode() -> str:
    """auto (default: kernel on TPU, scan on CPU) | on | off | interpret
    (kernel semantics on CPU via the Pallas interpreter — the test path)."""
    return os.environ.get("MINA_BRIDGE_TPU_TRANSCRIPT_KERNEL", "auto")

__all__ = [
    "poseidon_spec",
    "permute",
    "hash_fixed",
    "Sponge",
    "HostSponge",
    "host_permute",
    "host_hash",
]


@functools.cache
def _device_tables(ps: PoseidonSpec):
    L = ffl.REP_LIMBS
    rc = np.zeros((len(ps.round_constants), WIDTH, L), dtype=np.int32)
    for r, row in enumerate(ps.round_constants):
        for i, c in enumerate(row):
            rc[r, i] = int_to_limbs(c, L)
    mds = np.zeros((WIDTH, WIDTH, L), dtype=np.int32)
    for i in range(WIDTH):
        for j in range(WIDTH):
            mds[i, j] = int_to_limbs(ps.mds[i][j], L)
    return rc, mds


def _sbox(field: FieldSpec, x: jax.Array) -> jax.Array:
    """x^7 = (x^3)^2 * x : 2 squarings + 2 multiplications."""
    x2 = ffl.square(field, x)
    x3 = ffl.mul(field, x2, x)
    x6 = ffl.square(field, x3)
    return ffl.mul(field, x6, x)


def permute(ps: PoseidonSpec, state: jax.Array) -> jax.Array:
    """Apply the full permutation; state shape (..., 3, NLIMBS)."""
    field = ps.field
    rc, mds_np = _device_tables(ps)
    mds = jnp.asarray(mds_np)

    def round_body(st, rc_r):
        st = _sbox(field, st)
        # MDS: out[i] = sum_j mds[i][j] * st[j], as ONE broadcast
        # multiply (..., 3, 3, L) + a 2-add tree over j — the naive 9
        # muls + 6 adds formulation put 15 sequential field-op chains on
        # the permutation's critical path per round, and the sponge IS
        # the latency-bound part of the verify transcript.
        prod = ffl.mul(field, mds, st[..., None, :, :])  # (..., 3, 3, L)
        st = prod[..., 0, :]
        for j in range(1, WIDTH):  # 2-deep add tree at WIDTH=3
            st = ffl.add(field, st, prod[..., j, :])
        st = ffl.add(field, st, rc_r)
        return st, None

    out, _ = jax.lax.scan(round_body, state, jnp.asarray(rc))
    return out


def initial_state(ps: PoseidonSpec, batch_shape: tuple[int, ...] = ()) -> jax.Array:
    return ffl.zeros(ps.field, batch_shape + (WIDTH,))


def _to_rep(x: jax.Array) -> jax.Array:
    """Accept canonical 20-limb or REP 22-limb input."""
    if x.shape[-1] == ffl.REP_LIMBS:
        return x
    return ffl.from_canon(x)


def hash_fixed(ps: PoseidonSpec, inputs: jax.Array) -> jax.Array:
    """Hash a fixed-length sequence of field elements (kimchi `hash`).

    inputs: (..., n, NLIMBS) -> digest (..., NLIMBS). Absorbs rate-2
    chunks (permuting before each chunk after the first... kimchi absorbs
    then permutes lazily; digest is state[0] after final permutation).
    """
    inputs = _to_rep(inputs)
    n = inputs.shape[-2]
    state = initial_state(ps, inputs.shape[:-2])
    nfull = n - (n % RATE)
    if nfull:
        # all full rate-2 chunks under ONE scanned permutation instance
        chunks = inputs[..., :nfull, :]
        chunks = jnp.moveaxis(
            chunks.reshape(
                chunks.shape[:-2] + (nfull // RATE, RATE, chunks.shape[-1])
            ),
            -3,
            0,
        )  # (n/2, ..., RATE, L)

        def body(st, chunk):
            st = st.at[..., :RATE, :].set(
                ffl.add(ps.field, st[..., :RATE, :], chunk)
            )
            return permute(ps, st), None

        state, _ = jax.lax.scan(body, state, chunks)
    if n % RATE:
        tail = inputs[..., nfull:, :]
        k = tail.shape[-2]
        state = state.at[..., :k, :].set(
            ffl.add(ps.field, state[..., :k, :], tail)
        )
        state = permute(ps, state)
    if n == 0:
        state = permute(ps, state)
    return ffl.canon(ps.field, state[..., 0, :])


class Sponge:
    """Stateful kimchi sponge over device arrays (batched, host-driven).

    Sequencing (absorb/squeeze order) is host Python — it is static per
    protocol transcript — while all field math is device-side. Matches the
    `ArithmeticSponge` absorb/squeeze state machine.
    """

    def __init__(self, ps: PoseidonSpec, batch_shape: tuple[int, ...] = ()):
        self.ps = ps
        self.state = initial_state(ps, batch_shape)
        self.mode = "absorbing"
        self.offset = 0

    def absorb(self, x: jax.Array) -> None:
        """Absorb one field element (canonical 20-limb or REP 22-limb)."""
        x = _to_rep(x)
        if self.mode != "absorbing":
            self.mode, self.offset = "absorbing", 0
        if self.offset == RATE:
            self.state = permute(self.ps, self.state)
            self.offset = 0
        i = self.offset
        self.state = self.state.at[..., i, :].set(
            ffl.add(self.ps.field, self.state[..., i, :], x)
        )
        self.offset += 1

    def squeeze(self) -> jax.Array:
        """Squeeze one canonical 20-limb field element."""
        if self.mode == "absorbing" or self.offset == RATE:
            self.state = permute(self.ps, self.state)
            self.mode, self.offset = "squeezing", 0
        out = self.state[..., self.offset, :]
        self.offset += 1
        return ffl.canon(self.ps.field, out)


# ---------------------------------------------------------------------------
# Host reference (python ints)
# ---------------------------------------------------------------------------

def host_permute(ps: PoseidonSpec, state: list[int]) -> list[int]:
    from .. import native

    out = native.poseidon_permute(ps, list(state))
    if out is not None:
        return out
    return host_permute_py(ps, state)


def host_permute_py(ps: PoseidonSpec, state: list[int]) -> list[int]:
    """Pure-Python oracle for the native permutation."""
    p = ps.field.p
    st = list(state)
    for r in range(len(ps.round_constants)):
        st = [pow(x, 7, p) for x in st]
        st = [
            sum(ps.mds[i][j] * st[j] for j in range(WIDTH)) % p
            for i in range(WIDTH)
        ]
        st = [(st[i] + ps.round_constants[r][i]) % p for i in range(WIDTH)]
    return st


class HostSponge:
    def __init__(self, ps: PoseidonSpec):
        self.ps = ps
        self.state = [0] * WIDTH
        self.mode = "absorbing"
        self.offset = 0

    def absorb(self, x: int) -> None:
        if self.mode != "absorbing":
            self.mode, self.offset = "absorbing", 0
        if self.offset == RATE:
            self.state = host_permute(self.ps, self.state)
            self.offset = 0
        self.state[self.offset] = (self.state[self.offset] + x) % self.ps.field.p
        self.offset += 1

    def squeeze(self) -> int:
        if self.mode == "absorbing" or self.offset == RATE:
            self.state = host_permute(self.ps, self.state)
            self.mode, self.offset = "squeezing", 0
        out = self.state[self.offset]
        self.offset += 1
        return out


def host_hash(ps: PoseidonSpec, inputs: list[int]) -> int:
    sponge = HostSponge(ps)
    for x in inputs:
        sponge.absorb(x)
    return sponge.squeeze()


# ---------------------------------------------------------------------------
# Scheduled transcript execution (one permute instance per phase)
# ---------------------------------------------------------------------------

def run_transcript(
    ps: PoseidonSpec,
    ops: list,
    sponge: "Sponge | None" = None,
    batch_shape: tuple[int, ...] = (),
):
    """Execute a static absorb/squeeze schedule with ONE lax.scan.

    ops: list of ("absorb", array) / ("squeeze",). The absorb/squeeze
    pattern is simulated statically into permutation "blocks" (each block
    = up to RATE pre-permute additions + one permutation); the blocks run
    under a single lax.scan, so the compiled graph contains exactly one
    permutation instance no matter how long the transcript is. Semantics
    are bit-identical to driving `Sponge` op by op (tested).

    Returns (squeezed: list of canonical arrays, sponge: Sponge positioned
    for continuation).
    """
    if sponge is None:
        sponge = Sponge(ps, batch_shape)
    state = sponge.state
    mode, offset = sponge.mode, sponge.offset

    blocks: list[list] = []  # per block: list of (pos, array)
    cur: list = []
    squeeze_map: list[tuple[int, int]] = []
    for op in ops:
        if op[0] == "absorb":
            if mode != "absorbing":
                mode, offset = "absorbing", 0
            if offset == RATE:
                blocks.append(cur)
                cur = []
                offset = 0
            cur.append((offset, _to_rep(op[1])))
            offset += 1
        elif op[0] == "squeeze":
            if mode == "absorbing" or offset == RATE:
                blocks.append(cur)
                cur = []
                mode, offset = "squeezing", 0
            squeeze_map.append((len(blocks) - 1, offset))
            offset += 1
        else:
            raise ValueError(op[0])

    T = len(blocks)
    squeezed: list = []
    if T:
        bshape = state.shape[:-2]
        L = state.shape[-1]
        adds = jnp.zeros((T, RATE) + bshape + (L,), dtype=jnp.int32)
        for t, blk in enumerate(blocks):
            for pos, arr in blk:
                arr = jnp.broadcast_to(arr, bshape + (L,)).astype(jnp.int32)
                adds = adds.at[t, pos].add(arr)

        kmode = _transcript_kernel_mode()
        if kmode in ("on", "interpret") or (
            kmode == "auto" and transcript_kernel.use_kernel()
        ):
            all_states = transcript_kernel.transcript_blocks(
                ps, state, adds, interpret=(kmode == "interpret")
            )
            state = all_states[-1]
        else:

            def body(st, add_t):
                for i in range(RATE):
                    st = st.at[..., i, :].set(
                        ffl.add(ps.field, st[..., i, :], add_t[i])
                    )
                st = permute(ps, st)
                return st, st

            state, all_states = jax.lax.scan(body, state, adds)
        for bi, row in squeeze_map:
            squeezed.append(ffl.canon(ps.field, all_states[bi][..., row, :]))

    # apply trailing (un-permuted) absorbs directly to the running state
    for pos, arr in cur:
        state = state.at[..., pos, :].set(
            ffl.add(ps.field, state[..., pos, :], arr)
        )

    out_sponge = Sponge(ps, ())
    out_sponge.state = state
    out_sponge.mode = mode
    out_sponge.offset = offset
    return squeezed, out_sponge


def host_permute_round(ps: PoseidonSpec, state: list[int], r: int) -> list[int]:
    """One full round (sbox -> MDS -> +rc[r]); the poseidon gate's round."""
    p = ps.field.p
    st = [pow(x, 7, p) for x in state]
    st = [
        sum(ps.mds[i][j] * st[j] for j in range(WIDTH)) % p
        for i in range(WIDTH)
    ]
    return [(st[i] + ps.round_constants[r][i]) % p for i in range(WIDTH)]
