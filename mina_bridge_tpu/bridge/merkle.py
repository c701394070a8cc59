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

from ..fields import ff
from .state_hash import PREFIX_MERKLE_TREE, device_hash_with_prefix, host_hash_with_prefix

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
    """Batched Merkle fold: one Poseidon level per step, B accounts wide."""
    depth = siblings.shape[1]
    h = leaves
    for d in range(depth):
        sib = siblings[:, d]
        is_left = sibling_is_left[:, d]
        left = ff.select(is_left.astype(bool), sib, h)
        right = ff.select(is_left.astype(bool), h, sib)
        pair = jnp.stack([left, right], axis=-2)
        h = device_hash_with_prefix(f"{PREFIX_MERKLE_TREE}[{d}]", pair)
    return h
