"""Pickles step/wrap accumulator pipeline (reference README.md:477-604).

Host layer: the wrap proof carries pallas-side recursion accumulators
(prev_challenges) which the verifier re-opens inside its single MSM.
Device layer: batch_verify_tips runs TWO batched kimchi verifications on
the canonical tip shape (B=2, wrap n=2^10 with the step-transcript-replay
gadget rows, step n=16, R=2): the wrap proofs AND the wrapped step
proofs themselves (no load-bearing host verification — PARITY D7
closed); legacy accumulator-only tips fall back to the decider MSM. The
wrap circuit REPLAYS the step proof's Fiat-Shamir transcript in-circuit
and binds the derived folding prechallenges into the deferred-values
digest.
"""

import random

import jax
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
                    for _ in range(5)
                ]
                for _ in range(B)
            ],
            dtype=np.int32,
        )
    )


def _endo_chals(prechals):
    return [
        ipa.endo_to_field(c, VESTA.endo_scalar, VESTA.scalar.p)
        for c in prechals
    ]


def test_host_wrap_carries_accumulators(tips):
    tip1, tip2 = tips
    _, w_index, _, w_g, w_h = pk.block_setup()
    assert len(tip1.wrap.prev_challenges) == pk.MAX_PROOFS_VERIFIED
    assert prover_host.host_verify(w_index, tip1.wrap, w_g, w_h)
    assert prover_host.host_verify(w_index, tip2.wrap, w_g, w_h)


def test_host_step_accumulator_decides(tips):
    """The accumulator carries raw PRE-challenges; endo-mapping them in
    the native Fp side must reproduce sg = <s(chals), G>."""
    tip1, _ = tips
    chals = _endo_chals(tip1.step_acc_prechals)
    s = ipa.host_s_vector(chals, VESTA.scalar.p)
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
    import dataclasses as dc

    tip1, tip2 = tips
    dtips = pk.device_proofs([tip1, tip2])
    assert dtips.step is not None  # on-device step verification path
    rw = _rw(2)
    assert bool(pk.batch_verify_tips(dtips, rw))

    # corrupt step accumulator -> digest binding + prechal link reject
    # (same compiled shape)
    bad = dc.replace(dtips, acc_prechals=dtips.acc_prechals.at[1, 0, 0].add(1))
    assert not bool(pk.batch_verify_tips(bad, rw))

    # corrupt carried wrap accumulator -> wrap verify rejects
    bad_wrap = dc.replace(
        dtips.wrap, prev_chals=dtips.wrap.prev_chals.at[0, 0, 0, 0].add(1)
    )
    bad2 = dc.replace(dtips, wrap=bad_wrap)
    assert not bool(pk.batch_verify_tips(bad2, rw))


def test_device_rejects_unverified_step_proof(tips):
    """PARITY D7 closure criterion: a tip whose step proof host
    verification NEVER saw (and would reject) must be rejected on
    device. The forgery tampers a step EVALUATION: the wrap circuit's
    transcript replay only covers the step FQ side (commitments, vprime,
    L/R), so the wrap proof, deferred digest and accumulator all stay
    internally consistent — the legacy decider path accepts this forgery
    and only the on-device step verification catches it."""
    import dataclasses as dc

    tip1, tip2 = tips
    dtips = pk.device_proofs([tip1, tip2])
    rw = _rw(2)
    bad_step = dc.replace(
        dtips.step, evals=dtips.step.evals.at[0, 3, 0, 0].add(1)
    )
    forged = dc.replace(dtips, step=bad_step)
    assert not bool(pk.batch_verify_tips(forged, rw))
    # the SAME forgery passes the legacy accumulator-decider path —
    # documenting exactly the soundness gap the step path closes
    legacy = dc.replace(dtips, step=None)
    assert bool(pk.batch_verify_tips(legacy, rw))

    # pairing each wrap proof with the OTHER tip's (valid) step proof +
    # accumulator is rejected (digest binding + state linkage)
    swapped_steps = dc.replace(
        dtips,
        step=jax.tree.map(lambda x: x[::-1], dtips.step),
        acc_prechals=dtips.acc_prechals[::-1],
        acc_sg=dtips.acc_sg[::-1],
    )
    assert not bool(pk.batch_verify_tips(swapped_steps, rw))


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
        acc_prechals=dtips.acc_prechals[::-1],
        acc_sg=dtips.acc_sg[::-1],
    )
    assert not bool(pk.batch_verify_tips(swapped, rw))

    # host digest matches the wrap public input's second element
    assert tip1.wrap.public[1] == pk.deferred_digest_host(
        tip1.step_acc_prechals, tip1.step_acc_sg
    )


def _honest_wrap_witness(tip, state_hash=1):
    """Rebuild the honest wrap witness for tip's step proof (the same
    construction prove_tip uses), returning (witness, public, gadget,
    circuit pieces, the step absorb values)."""
    from mina_bridge_tpu.kimchi.circuit import COLUMNS

    s_circuit, s_index, _, s_g, s_h = pk.step_setup()
    w_circuit, gadget, w_index, _, w_g, w_h = pk.wrap_setup()
    fs = PALLAS.scalar
    w = [[0] * w_circuit.n for _ in range(COLUMNS)]
    # recover the step proof from the tip: prove_tip is deterministic
    # only with its rng, so re-derive the absorb values from the step
    # side by re-proving with the same seed is overkill — instead use
    # the wrap fixture path: replay from tip's own step data is not
    # possible without the step proof, so prove a fresh one here.
    rng = random.Random(0xDEAD)
    sp = VESTA.scalar.p
    sw = [[0] * s_circuit.n for _ in range(COLUMNS)]
    sw[0][0] = state_hash % sp
    step_proof = prover_host.prove(
        s_index, s_circuit, sw, [state_hash % sp], s_g, s_h, rng
    )
    vals = pk._step_absorb_values(s_index, step_proof, s_g, s_h)
    return w, gadget, w_circuit, w_index, w_g, w_h, step_proof, vals


def test_wrap_circuit_replays_step_transcript(tips):
    """PARITY D7 gadget: the wrap circuit replays the step proof's
    Fiat-Shamir transcript and binds the derived folding prechallenges
    into the deferred digest. A witness claiming an accumulator whose
    prechallenges weren't derived from the absorbed commitments — e.g.
    after tampering one step commitment coordinate — is UNPROVABLE."""
    fs = PALLAS.scalar
    (w, gadget, w_circuit, w_index, w_g, w_h, step_proof, vals) = (
        _honest_wrap_witness(None)
    )
    prechals = list(step_proof.opening.prechals)
    sg = step_proof.opening.sg

    # honest fill: replay + prechal extraction + digest
    w[gadget["dig_cell"][0]][gadget["dig_cell"][1]] = gadget["dig_value"]
    squeezes = pk._transcript_fill(w, gadget["replay"], vals, fs)
    los = [
        pk._prechal_fill(w, pg, squeezes[i], fs.p)
        for pg, i in zip(gadget["prechals"], gadget["chal_sq"])
    ]
    assert los == prechals, "in-circuit replay == IPA prover transcript"
    [digest] = pk._transcript_fill(
        w, gadget["digest"], los + [sg[0], sg[1]], fs
    )
    assert digest == pk.deferred_digest_host(prechals, sg)
    w[0][0], w[0][1] = 1, digest
    w_circuit.check_witness(w, [1, digest])

    # tamper ONE absorbed step commitment coordinate: the replayed
    # squeezes diverge, so the digest preimage (the claimed honest
    # accumulator) no longer matches the in-circuit derivation
    from mina_bridge_tpu.kimchi.circuit import COLUMNS

    w2 = [[0] * w_circuit.n for _ in range(COLUMNS)]
    w2[gadget["dig_cell"][0]][gadget["dig_cell"][1]] = gadget["dig_value"]
    vals2 = list(vals)
    vals2[3] = (vals2[3] + 1) % fs.p  # a w_comm coordinate
    sq2 = pk._transcript_fill(w2, gadget["replay"], vals2, fs)
    assert sq2 != squeezes
    for pg, i in zip(gadget["prechals"], gadget["chal_sq"]):
        pk._prechal_fill(w2, pg, sq2[i], fs.p)
    # claim the HONEST accumulator in the digest anyway
    pk._transcript_fill(w2, gadget["digest"], los + [sg[0], sg[1]], fs)
    w2[0][0], w2[0][1] = 1, digest
    with pytest.raises(AssertionError):
        w_circuit.check_witness(w2, [1, digest])

    # pinned step-index digest: claiming a transcript for a DIFFERENT
    # step circuit (wrong leading absorb) is equally unprovable
    w3 = [[0] * w_circuit.n for _ in range(COLUMNS)]
    # dig_cell left honest: the tampered leading absorb now disagrees
    # with the pinned constant through the copy constraint
    w3[gadget["dig_cell"][0]][gadget["dig_cell"][1]] = gadget["dig_value"]
    vals3 = list(vals)
    vals3[0] = (vals3[0] + 1) % fs.p
    sq3 = pk._transcript_fill(w3, gadget["replay"], vals3, fs)
    for pg, i in zip(gadget["prechals"], gadget["chal_sq"]):
        pk._prechal_fill(w3, pg, sq3[i], fs.p)
    pk._transcript_fill(w3, gadget["digest"], los + [sg[0], sg[1]], fs)
    w3[0][0], w3[0][1] = 1, digest
    with pytest.raises(AssertionError):
        w_circuit.check_witness(w3, [1, digest])
