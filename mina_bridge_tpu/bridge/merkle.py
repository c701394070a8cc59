"""Merkle Proof-of-Account verification: batched device path folding.

Device counterpart of the aligned fork's `operator/mina_account/`
verifier (reference README.md:358-362): hash the account to the leaf,
fold the 35-deep Merkle path (Left/Right siblings) with one Poseidon
level per step — batched over many accounts in parallel (SURVEY §2b) —
and compare the resulting root with the snarked ledger hash.

Mina hashes each tree level with a depth-tagged prefix
('MinaMklTree[d]'); depth tagging is preserved here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import ff, ffl
from ..fields.params import int_to_limbs
from ..hash import poseidon
from ..hash.poseidon_params import RATE, WIDTH, poseidon_spec
from .state_hash import (
    PREFIX_MERKLE_TREE,
    device_hash_with_prefix,
    host_hash_with_prefix,
    prefix_to_field,
)

LEDGER_DEPTH = 35  # Mina ledger depth (reference account_proof merkle_path)


def host_merkle_root(
    leaf: int, path: list[tuple[str, int]], depth: int = LEDGER_DEPTH
) -> int:
    """path: [(side, sibling_hash)] from leaf to root; side is the side
    the SIBLING is on ('Left' => sibling is left child)."""
    h = leaf
    for d, (side, sib) in enumerate(path):
        prefix = f"{PREFIX_MERKLE_TREE}[{d}]"
        if side == "Left":
            h = host_hash_with_prefix(prefix, [sib, h])
        else:
            h = host_hash_with_prefix(prefix, [h, sib])
    return h


def device_merkle_roots(
    leaves: jax.Array,  # (B, NLIMBS) canonical leaf hashes
    siblings: jax.Array,  # (B, depth, NLIMBS)
    sibling_is_left: jax.Array,  # (B, depth) int32 (1 = sibling on left)
) -> jax.Array:
    """Batched Merkle fold: one Poseidon level per step, B accounts wide.

    All levels run under ONE lax.scan (depth-tagged prefixes are scanned
    constants), so the compiled graph has a single sponge instance.
    """
    ps = poseidon_spec("fp")
    depth = siblings.shape[1]
    B = leaves.shape[0]
    prefixes = np.stack(
        [
            int_to_limbs(prefix_to_field(f"{PREFIX_MERKLE_TREE}[{d}]"), ffl.REP_LIMBS)
            for d in range(depth)
        ]
    )  # (depth, L)

    def level(h, inp):
        sib, is_left, pref = inp
        left = ff.select(is_left.astype(bool), sib, h)
        right = ff.select(is_left.astype(bool), h, sib)
        # sponge: absorb prefix, left (permute), right (permute), squeeze
        state = poseidon.initial_state(ps, (B,))
        state = state.at[..., 0, :].set(ffl.from_canon(jnp.broadcast_to(pref[None], (B, ffl.REP_LIMBS))))
        state = state.at[..., 1, :].set(
            ffl.add(ps.field, state[..., 1, :], ffl.from_canon(left))
        )
        state = poseidon.permute(ps, state)
        state = state.at[..., 0, :].set(
            ffl.add(ps.field, state[..., 0, :], ffl.from_canon(right))
        )
        state = poseidon.permute(ps, state)
        return ffl.canon(ps.field, state[..., 0, :]), None

    out, _ = jax.lax.scan(
        level,
        leaves,
        (
            jnp.moveaxis(siblings, 1, 0),
            jnp.moveaxis(sibling_is_left, 1, 0),
            jnp.asarray(prefixes),
        ),
    )
    return out
