"""Pippenger MSM vs host oracle, single-device and sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.curves import PALLAS, host as hc, jaxcurve as jc
from mina_bridge_tpu.fields import ff
from mina_bridge_tpu.ops import msm as msm_mod


def setup_case(rng, n):
    c = PALLAS
    pts = [hc.mul(c, rng.randrange(1, c.scalar.p), c.generator) for i in range(n)]
    ks = [rng.randrange(c.scalar.p) for _ in range(n)]
    ks[0] = 0  # zero scalar contributes nothing
    dp = jc.from_affine_ints(c, pts)
    dk = ff.from_ints(c.scalar, ks)
    return c, pts, ks, dp, dk


def test_msm_matches_host(rng):
    c, pts, ks, dp, dk = setup_case(rng, 32)
    out = jax.jit(msm_mod.msm, static_argnums=0)(c, dk, dp)
    got = jc.to_affine_ints(c, out)[0]
    want = hc.msm(c, ks, pts)
    assert got == want


def test_pmsm_matches_host(rng):
    """The Pallas-path MSM (signed-digit Pippenger; bench.py's kernel) on
    its CPU fallback path, vs the host oracle — includes a max-digit
    scalar (p-1) to exercise the recoding carry chain."""
    from mina_bridge_tpu.ops import pmsm

    c, pts, ks, dp, dk = setup_case(rng, 32)
    ks[1] = c.scalar.p - 1  # long carry chain in signed-digit recoding
    dk = ff.from_ints(c.scalar, ks)
    out = jax.jit(pmsm.msm, static_argnums=0)(c, dk, dp)
    got = jc.to_affine_ints(c, out)[0]
    want = hc.msm(c, ks, pts)
    assert got == want


def test_pmsm_multichunk_matches_host(rng):
    """Small G forces T = N/G > 1 chunks, exercising the lane-boundary
    repair (Blelloch segmented inflow scan) and cross-chunk segments."""
    from mina_bridge_tpu.ops import pmsm

    c, pts, ks, dp, dk = setup_case(rng, 128)
    # clustered digits -> long segments spanning several lanes/chunks
    ks = [(i // 7 + 1) * (1 << 13 * (i % 3)) for i in range(128)]
    dk = ff.from_ints(c.scalar, ks)
    out = jax.jit(pmsm.msm, static_argnums=(0, 3))(c, dk, dp, 16)
    got = jc.to_affine_ints(c, out)[0]
    want = hc.msm(c, ks, pts)
    assert got == want


def test_pmsm_identities_and_padding(rng):
    """Identity input points (the mixed-add scan must mask them) plus a
    point count that is not a multiple of the chunk width G (exercising
    the (0, identity) padding added for the batched verifier's arbitrary
    MSM sizes)."""
    from mina_bridge_tpu.ops import pmsm

    c, pts, ks, dp, dk = setup_case(rng, 45)
    pts[3] = None
    pts[44] = None
    dp = jc.from_affine_ints(c, pts)
    out = jax.jit(pmsm.msm, static_argnums=(0, 3))(c, dk, dp, 16)
    got = jc.to_affine_ints(c, out)[0]
    want = hc.msm(
        c, [k for k, p in zip(ks, pts) if p], [p for p in pts if p]
    )
    assert got == want


def test_msm_sharded_matches_host(rng):
    c, pts, ks, dp, dk = setup_case(rng, 32)
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("shard",))
    out = msm_mod.msm_sharded(c, dk, dp, mesh)
    got = jc.to_affine_ints(c, out)[0]
    want = hc.msm(c, ks, pts)
    assert got == want


def test_mesh_helpers():
    import numpy as np

    from mina_bridge_tpu.parallel import mesh as pm

    m = pm.make_mesh()
    assert m.devices.size == len(jax.devices())
    m2 = pm.make_mesh(n_dp=2, n_pt=4)
    assert m2.shape == {"dp": 2, "pt": 4}
    x = jnp.zeros((2, 8))
    y = pm.shard_proof_batch(x, m2)
    assert y.shape == x.shape


def test_msm_on_production_mesh(rng):
    """MSM sharded over the pt axis of the 2-axis (dp, pt) production
    mesh (parallel/distributed.py): dp spans hosts, pt spans local
    chips; the dp axis rides along untouched."""
    from mina_bridge_tpu.parallel import distributed as dist

    dist.initialize()  # no-op single-process
    mesh = dist.production_mesh(dp=2)
    assert mesh.shape == {"dp": 2, "pt": 4}
    c, pts, ks, dp, dk = setup_case(rng, 16)
    out = msm_mod.msm_sharded(c, dk, dp, mesh, axis="pt")
    got = jc.to_affine_ints(c, out)[0]
    assert got == hc.msm(c, ks, pts)
