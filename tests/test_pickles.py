"""Pickles step/wrap accumulator pipeline (reference README.md:477-604).

Host layer: the wrap proof carries pallas-side recursion accumulators
(prev_challenges) which the verifier re-opens inside its single MSM;
the step proof's vesta-side accumulator is checked by the batched
decider MSM. Device layer: batch_verify_tips runs both programs on the
canonical tip shape (B=2, wrap n=128 with the deferred-values gadget
rows, step n=16, R=2).
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from mina_bridge_tpu.commitment import ipa
from mina_bridge_tpu.curves import PALLAS, VESTA, host as hc
from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
from mina_bridge_tpu.kimchi import prover_host
from mina_bridge_tpu.pickles import verifier as pk


@pytest.fixture(scope="module")
def tips():
    rng = random.Random(42)
    tip1 = pk.prove_tip(0x1234567890ABCDEF, rng)
    # the second tip chains on the first (the bridge's chain axis)
    tip2 = pk.prove_tip(0xFEDCBA, rng, prev_wrap_accs=[tip1.accumulator()])
    return tip1, tip2


def _rw(B, seed=7):
    rng = random.Random(seed)
    return jnp.asarray(
        np.array(
            [
                [
                    int_to_limbs(rng.randrange(PALLAS.scalar.p), NLIMBS)
                    for _ in range(3)
                ]
                for _ in range(B)
            ],
            dtype=np.int32,
        )
    )


def test_host_wrap_carries_accumulators(tips):
    tip1, tip2 = tips
    _, w_index, _, w_g, w_h = pk.block_setup()
    assert len(tip1.wrap.prev_challenges) == pk.MAX_PROOFS_VERIFIED
    assert prover_host.host_verify(w_index, tip1.wrap, w_g, w_h)
    assert prover_host.host_verify(w_index, tip2.wrap, w_g, w_h)


def test_host_step_accumulator_decides(tips):
    tip1, _ = tips
    s = ipa.host_s_vector(tip1.step_acc_chals, VESTA.scalar.p)
    _, _, _, s_g, _ = pk.step_setup()
    assert hc.msm(VESTA, s, s_g) == tip1.step_acc_sg


def test_host_rejects_corrupt_carried_accumulator(tips):
    _, tip2 = tips
    _, w_index, _, w_g, w_h = pk.block_setup()
    import copy

    bad = copy.deepcopy(tip2.wrap)
    chals, sg = bad.prev_challenges[0]
    bad.prev_challenges[0] = (
        [(c + 1) % PALLAS.scalar.p for c in chals],
        sg,
    )
    assert not prover_host.host_verify(w_index, bad, w_g, w_h)


def test_device_batch_verify_tips(tips):
    tip1, tip2 = tips
    dtips = pk.device_proofs([tip1, tip2])
    rw = _rw(2)
    assert bool(pk.batch_verify_tips(dtips, rw))

    # corrupt step accumulator -> decider rejects (same compiled shape)
    bad = pk.DeviceTips(
        wrap=dtips.wrap,
        acc_chals=dtips.acc_chals.at[1, 0, 0].add(1),
        acc_sg=dtips.acc_sg,
    )
    assert not bool(pk.batch_verify_tips(bad, rw))

    # corrupt carried wrap accumulator -> wrap verify rejects
    import dataclasses as dc

    bad_wrap = dc.replace(
        dtips.wrap, prev_chals=dtips.wrap.prev_chals.at[0, 0, 0, 0].add(1)
    )
    bad2 = pk.DeviceTips(
        wrap=bad_wrap, acc_chals=dtips.acc_chals, acc_sg=dtips.acc_sg
    )
    assert not bool(pk.batch_verify_tips(bad2, rw))


def test_deferred_digest_binds_accumulator(tips):
    """PARITY D7: the wrap public input binds the step accumulator.
    Swapping two internally-consistent accumulators between tips keeps
    the decider MSM happy — only the deferred-values digest check can
    reject it."""
    tip1, tip2 = tips
    dtips = pk.device_proofs([tip1, tip2])
    rw = _rw(2)
    swapped = pk.DeviceTips(
        wrap=dtips.wrap,
        acc_chals=dtips.acc_chals[::-1],
        acc_sg=dtips.acc_sg[::-1],
    )
    assert not bool(pk.batch_verify_tips(swapped, rw))

    # host digest matches the wrap public input's second element
    assert tip1.wrap.public[1] == pk.deferred_digest_host(
        tip1.step_acc_chals, tip1.step_acc_sg
    )


def test_wrap_circuit_computes_digest_in_circuit(tips):
    """PARITY D7 gadget: the wrap circuit itself hashes the accumulator
    preimage (in-circuit poseidon sponge) and pins public input 1 to the
    result — a wrap witness with a wrong digest is UNPROVABLE."""
    tip1, _ = tips
    from mina_bridge_tpu.kimchi.circuit import COLUMNS

    w_circuit, gadget, w_index, _, w_g, w_h = pk.wrap_setup()
    fs = PALLAS.scalar
    w = [[0] * w_circuit.n for _ in range(COLUMNS)]
    pre = []
    for c in tip1.step_acc_chals:
        lo, hi = ipa._split_scalar(VESTA, c)
        pre += [lo, hi]
    pre += [tip1.step_acc_sg[0], tip1.step_acc_sg[1]]
    digest = pk._sponge_fill(w, gadget, pre, fs)
    # in-circuit sponge == host sponge
    assert digest == pk.deferred_digest_host(
        tip1.step_acc_chals, tip1.step_acc_sg
    )
    # honest witness proves
    w[0][0], w[0][1] = 1, digest
    rng = random.Random(3)
    pr = prover_host.prove(w_index, w_circuit, w, [1, digest], w_g, w_h, rng)
    assert prover_host.host_verify(w_index, pr, w_g, w_h)
    # wrong digest: the copy constraint to the gadget output fails
    bad_digest = (digest + 1) % fs.p
    w[0][1] = bad_digest
    with pytest.raises(AssertionError):
        prover_host.prove(
            w_index, w_circuit, w, [1, bad_digest], w_g, w_h, rng
        )
    # tampered preimage (different accumulator, same digest claim):
    # the poseidon rows no longer hash to the claimed digest
    w2 = [[0] * w_circuit.n for _ in range(COLUMNS)]
    pre2 = list(pre)
    pre2[0] = (pre2[0] + 1) % fs.p
    pk._sponge_fill(w2, gadget, pre2, fs)
    w2[0][0], w2[0][1] = 1, digest
    with pytest.raises(AssertionError):
        prover_host.prove(
            w_index, w_circuit, w2, [1, digest], w_g, w_h, rng
        )
