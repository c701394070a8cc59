"""Mina protocol-state hashing: chain linkage + batched device hashing.

Implements the hash discipline the Proof-of-State verifier relies on
(reference README.md:281-288): a state's hash is
    state_hash = H(prefix_protostate, [previous_state_hash, body_hash])
so hashing state_hash(n) together with body_hash(n+1) yields
state_hash(n+1) — the chain-linkage rule the bridge walks from the root
to the candidate tip.

Domain separation follows Mina's convention of fixed 20-byte prefix
strings absorbed as the first field element ('MinaProtoState' etc.); the
exact official prefix constants are data (bridge/constants.py) — see
PARITY.md for the parity ledger.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import ff
from ..hash import poseidon
from ..hash.poseidon_params import poseidon_spec

PREFIX_PROTO_STATE = "MinaProtoState"
PREFIX_PROTO_STATE_BODY = "MinaProtoStateBody"
PREFIX_ACCOUNT = "MinaAccount"
PREFIX_MERKLE_TREE = "MinaMklTree"  # + depth suffix


def prefix_to_field(prefix: str) -> int:
    """20-byte-padded prefix string as a little-endian field element."""
    data = prefix.encode()[:20].ljust(20, b"\x00")
    return int.from_bytes(data, "little")


def host_hash_with_prefix(prefix: str, inputs: list[int]) -> int:
    ps = poseidon_spec("fp")
    sponge = poseidon.HostSponge(ps)
    sponge.absorb(prefix_to_field(prefix))
    for x in inputs:
        sponge.absorb(x)
    return sponge.squeeze()


def host_state_hash(previous_state_hash: int, body_hash: int) -> int:
    return host_hash_with_prefix(
        PREFIX_PROTO_STATE, [previous_state_hash, body_hash]
    )


def device_hash_with_prefix(prefix: str, inputs: jax.Array) -> jax.Array:
    """Batched: inputs (..., n, NLIMBS) -> (..., NLIMBS)."""
    ps = poseidon_spec("fp")
    pref = ff.from_int(ps.field, prefix_to_field(prefix))
    pref = jnp.broadcast_to(pref, inputs.shape[:-2] + (1, inputs.shape[-1]))
    return poseidon.hash_fixed(ps, jnp.concatenate([pref, inputs], axis=-2))


def device_state_hashes(
    prev_hashes: jax.Array, body_hashes: jax.Array
) -> jax.Array:
    """Batched chain-linkage hash: (..., NLIMBS) x2 -> (..., NLIMBS)."""
    pairs = jnp.stack([prev_hashes, body_hashes], axis=-2)
    return device_hash_with_prefix(PREFIX_PROTO_STATE, pairs)
