"""Device mesh construction + sharding helpers (SURVEY §2c).

The framework's two parallel axes: 'dp' — the proof batch (many
Proof-of-State / Proof-of-Account verifications at once; shards across
hosts over DCN) and 'pt' — the MSM point/SRS dimension (shards across
chips over ICI). The reference has no distributed backend (SURVEY §2c:
rayon + an external operator fleet); here jax.sharding + shard_map with
XLA collectives is the one communication layer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_PROOFS = "dp"
AXIS_POINTS = "pt"


def make_mesh(
    n_dp: int | None = None, n_pt: int | None = None, devices=None
) -> Mesh:
    """A (dp, pt) mesh over the available devices.

    Defaults: all devices on 'pt' (single-host: the MSM point axis is the
    profitable intra-host axis); pass n_dp>1 to split the proof batch
    across device groups (multi-host layouts put 'dp' on the DCN side).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    total = devs.size
    if n_dp is None and n_pt is None:
        n_dp, n_pt = 1, total
    elif n_dp is None:
        n_dp = total // n_pt
    elif n_pt is None:
        n_pt = total // n_dp
    assert n_dp * n_pt <= total
    grid = devs[: n_dp * n_pt].reshape(n_dp, n_pt)
    return Mesh(grid, (AXIS_PROOFS, AXIS_POINTS))


def shard_proof_batch(tree, mesh: Mesh):
    """Place a DeviceProofs-like pytree with the batch axis on 'dp'."""
    sharding = NamedSharding(mesh, P(AXIS_PROOFS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
