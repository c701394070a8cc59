"""Wire codec for the candidate tip proof (MinaBaseProofStableV2
counterpart, bridge/pickles_wire.py): byte-identical round-trips and the
envelope path from node-served bytes to host verification. The device
leg (decoded envelope -> DeviceTips -> batch_verify_tips) is covered by
tests/test_e2e_bridge.py::test_submit_state_e2e through the SDK."""

import random

import pytest

from mina_bridge_tpu.bridge import pickles_wire as pw
from mina_bridge_tpu.bridge import proof_model as pm
from mina_bridge_tpu.bridge import fixtures
from mina_bridge_tpu.pickles import verifier as pv


@pytest.fixture(scope="module")
def tip():
    return pv.prove_tip(0xABCDE, rng=random.Random(0xD12))


def test_tip_proof_roundtrip_bytes(tip):
    blob = pw.encode_tip_proof(tip)
    tip2 = pw.decode_tip_proof(blob)
    blob2 = pw.encode_tip_proof(tip2)
    assert blob == blob2, "encode(decode(encode)) not byte-identical"
    # structural identity of every component
    assert tip2.step_acc_prechals == tip.step_acc_prechals
    assert tip2.step_acc_sg == tip.step_acc_sg
    assert tip2.wrap.public == tip.wrap.public
    assert [list(e) for e in tip2.wrap.evals] == [
        list(e) for e in tip.wrap.evals
    ]
    assert tip2.wrap.w_comm == tip.wrap.w_comm
    assert tip2.wrap.t_comm == tip.wrap.t_comm
    assert tip2.wrap.opening.lr == tip.wrap.opening.lr
    assert tip2.wrap.opening.z1 == tip.wrap.opening.z1
    assert tip2.wrap.prev_challenges == tip.wrap.prev_challenges
    # the wrapped step proof rides the v3 envelope (on-device D7 path)
    assert tip2.step is not None
    assert tip2.step.public == tip.step.public
    assert tip2.step.evals == [list(e) for e in tip.step.evals] or (
        tip2.step.evals == tip.step.evals
    )
    assert tip2.step.opening.sg == tip.step.opening.sg
    # a legacy envelope without the step proof still decodes
    doc = pw.tip_doc(tip)
    doc["step_proof"] = None
    legacy = pw.tip_from_doc(pw.TIP_PROOF.decode(pw.TIP_PROOF.encode(doc)))
    assert legacy.step is None
    assert legacy.wrap.public == tip.wrap.public


def test_decoded_tip_host_verifies(tip):
    """A proof envelope produced by the host prover survives
    encode -> decode -> verification (VERDICT r3 item 3's bar)."""
    from mina_bridge_tpu.kimchi import prover_host

    tip2 = pw.decode_tip_proof(pw.encode_tip_proof(tip))
    _, _, index, _, g, h = pv.wrap_setup(pv.BLOCK_LOG_N, pv.STEP_LOG_N)
    assert prover_host.host_verify(index, tip2.wrap, g, h)
    # a value tampered THROUGH the wire (re-encoded, re-decoded) still
    # breaks verification: the codec carries semantics, not just bytes
    doc = pw.TIP_PROOF.decode(pw.encode_tip_proof(tip))
    doc["proof"]["opening"]["z1"] ^= 1
    tip3 = pw.tip_from_doc(pw.TIP_PROOF.decode(pw.TIP_PROOF.encode(doc)))
    assert not prover_host.host_verify(index, tip3.wrap, g, h)


def test_state_proof_envelope_roundtrip(tip):
    """The tip proof travels INSIDE MinaStateProof as structured binprot
    (reference core/src/mina.rs:235-248 decodes it in the envelope)."""
    rng = random.Random(0x11E)
    pub, proof, states, tip_state = fixtures.make_state_proof(
        rng, tip_doc=pw.tip_doc(tip)
    )
    blob = proof.encode()
    proof2 = pm.MinaStateProof.decode(blob)
    assert proof2.encode() == blob
    tip2 = proof2.tip_proof()
    assert tip2.wrap.public == tip.wrap.public
    assert tip2.step_acc_sg == tip.step_acc_sg


def test_malformed_tip_blob_rejected():
    with pytest.raises(Exception):
        pw.TIP_PROOF.decode(b"")
    with pytest.raises(Exception):
        pw.TIP_PROOF.decode(b"\x07garbage")
