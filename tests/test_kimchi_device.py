"""TPU (device) kimchi verifier vs host-proven fixtures."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
from mina_bridge_tpu.kimchi import prover_host, verifier
from tests.test_kimchi_host import build_example


@pytest.fixture(scope="module")
def proven():
    curve, circuit, witness_for = build_example()
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, curve, g, h)
    rng = random.Random(99)
    proofs = []
    for x, y in [(3, 5), (7, 11)]:
        w, pub = witness_for(x, y)
        proofs.append(prover_host.prove(index, circuit, w, pub, g, h, rng))
    return curve, circuit, index, g, h, proofs


def rand_weights(curve, B, seed=7, n=2):
    """(B, n, NLIMBS) verifier randomness; tip flows need n=5 (wrap w/rho,
    the legacy decider weight, step w/rho)."""
    rng = random.Random(seed)
    return jnp.asarray(
        np.array(
            [
                [
                    int_to_limbs(rng.randrange(curve.scalar.p), NLIMBS)
                    for _ in range(n)
                ]
                for _ in range(B)
            ],
            dtype=np.int32,
        )
    )


def test_device_verify_batch(proven):
    curve, circuit, index, g, h, host_proofs = proven
    dindex = verifier.DeviceVerifierIndex.from_host(index, g, h)
    dproofs = verifier.DeviceProofs.from_host(host_proofs)
    ok = verifier.verify(dindex, dproofs, rand_weights(curve, len(host_proofs)))
    assert bool(ok)


def test_device_reject_tampered(proven):
    curve, circuit, index, g, h, host_proofs = proven
    dindex = verifier.DeviceVerifierIndex.from_host(index, g, h)
    dproofs = verifier.DeviceProofs.from_host(host_proofs)
    import dataclasses

    bad = dataclasses.replace(
        dproofs, public=dproofs.public.at[0, 0, 0].add(1)
    )
    ok = verifier.verify(dindex, bad, rand_weights(curve, 2))
    assert not bool(ok)

    bad2 = dataclasses.replace(dproofs, z1=dproofs.z1.at[1, 3].add(1))
    ok2 = verifier.verify(dindex, bad2, rand_weights(curve, 2))
    assert not bool(ok2)

    # z2, sg and delta enter ONLY the batched MSM (never the transcript):
    # their rejection proves the MSM identity check itself is live. The
    # round-3 absorbing-identity bug (ipa.aff_to_rep encoding the
    # identity as (0,0,0), which swallows the whole RCB point sum) made
    # exactly these corruptions pass while transcript-bound ones still
    # failed via the U-hint validation.
    bad3 = dataclasses.replace(dproofs, z2=dproofs.z2.at[0, 2].add(1))
    assert not bool(verifier.verify(dindex, bad3, rand_weights(curve, 2)))

    bad4 = dataclasses.replace(dproofs, sg=dproofs.sg.at[1, 0, 0].add(1))
    assert not bool(verifier.verify(dindex, bad4, rand_weights(curve, 2)))


def test_device_verify_with_public_hint(proven):
    """The host-hinted public-commitment path: an honest hint verifies,
    and a WRONG hint (a valid curve point that is not sum p_i L_i + H)
    is rejected by the w^2 binding rows even though the transcript was
    built around it — the hint is untrusted input."""
    curve, circuit, index, g, h, host_proofs = proven
    dindex = verifier.DeviceVerifierIndex.from_host(index, g, h)
    dproofs = verifier.DeviceProofs.from_host(host_proofs)
    hint = verifier.host_public_commitments(
        dindex, [p.public for p in host_proofs]
    )
    rw = rand_weights(curve, len(host_proofs))
    assert bool(verifier.verify(dindex, dproofs, rw, pub_comm_hint=hint))

    # wrong hint: same shape, a real curve point (2*correct)
    import numpy as np

    from mina_bridge_tpu.curves import host as hc
    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs, limbs_to_int

    hint_np = np.asarray(hint)  # (B, nc, 2, NLIMBS)
    wrong = hint_np.copy()
    pt = (limbs_to_int(hint_np[0, 0, 0]), limbs_to_int(hint_np[0, 0, 1]))
    dbl = hc.add(curve, pt, pt)
    wrong[0, 0, 0] = int_to_limbs(dbl[0], NLIMBS)
    wrong[0, 0, 1] = int_to_limbs(dbl[1], NLIMBS)
    assert not bool(
        verifier.verify(dindex, dproofs, rw, pub_comm_hint=jnp.asarray(wrong))
    )

    # MALFORMED hints (not well-formed canonical on-curve points) must be
    # rejected by the well-formedness gate, not rely on the value binding:
    # (a) off-curve point: y bumped by 1 — same limb ranges, not on curve
    off = hint_np.copy()
    y1 = (limbs_to_int(hint_np[0, 0, 1]) + 1) % curve.base.p
    off[0, 0, 1] = int_to_limbs(y1, NLIMBS)
    assert not bool(
        verifier.verify(dindex, dproofs, rw, pub_comm_hint=jnp.asarray(off))
    )
    # (b) out-of-range limbs encoding the same residue: adds p to x via
    # limb 0 — violates the canonical 13-bit bound invariant
    oob = hint_np.copy()
    oob[0, 0, 0, 0] += 1 << 13
    oob[0, 0, 0, 1] -= 1  # keep a plausible-looking array, limb 0 overflows
    assert not bool(
        verifier.verify(dindex, dproofs, rw, pub_comm_hint=jnp.asarray(oob))
    )
