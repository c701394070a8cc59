"""The REAL Mina protocol-state wire layout vs the reference's golden
devnet vector (constants.rs:22-24) — the one piece of actual Mina chain
data available offline. Pure host-side tests (no device programs)."""

import pytest

from mina_bridge_tpu.bridge import mina_state_v2 as mv2
from mina_bridge_tpu.bridge import mina_types as mt
from mina_bridge_tpu.bridge import proof_model as pm
from mina_bridge_tpu.fields.params import FP


@pytest.fixture(scope="module")
def golden():
    blob = mv2.golden_tip_bytes()
    return blob, mv2.decode_protocol_state(blob)


def test_golden_decodes_fully(golden):
    """The devnet tip blob parses with zero trailing bytes (Desc.decode
    raises otherwise) and re-encodes byte-identically."""
    blob, st = golden
    assert mv2.encode_protocol_state(st) == blob


def test_golden_protocol_constants(golden):
    """Every decoded protocol constant matches Mina devnet — strong
    evidence the field layout (not just the total length) is right."""
    _, st = golden
    ct = st["body"]["constants"]
    assert ct["k"] == 290
    assert ct["slots_per_epoch"] == 7140
    assert ct["slots_per_sub_window"] == 7
    assert ct["grace_period_slots"] == 2160
    assert ct["delta"] == 0
    cs = st["body"]["consensus_state"]
    assert len(cs["sub_window_densities"]) == 11
    assert all(d <= 7 for d in cs["sub_window_densities"])
    assert cs["curr_global_slot_since_hard_fork"]["slots_per_epoch"] == 7140
    assert cs["curr_global_slot_since_hard_fork"]["slot_number"][0] == (
        "Since_hard_fork"
    )
    # the "since genesis" slot must be >= the "since hard fork" slot
    assert (
        cs["global_slot_since_genesis"][1][0]
        >= cs["curr_global_slot_since_hard_fork"]["slot_number"][1][0]
    )
    assert len(cs["last_vrf_output"]) == 32
    bs = st["body"]["blockchain_state"]
    assert len(bs["body_reference"]) == 32
    assert len(bs["staged_ledger_hash"]["non_snark"]["aux_hash"]) == 32
    # the snarked statement carries no pending fee excess on a chain tip
    fe = bs["ledger_proof_statement"]["fee_excess"]
    assert fe["fee_excess_l"]["magnitude"] == 0
    assert fe["fee_excess_r"]["magnitude"] == 0


def test_golden_field_elements_valid(golden):
    """Every 32-byte field slot decodes below the Pallas base-field
    modulus — a random misalignment would violate this with overwhelming
    probability."""
    _, st = golden

    def walk(v):
        if isinstance(v, dict):
            for x in v.values():
                walk(x)
        elif isinstance(v, (list, tuple)):
            for x in v:
                walk(x)
        elif isinstance(v, int) and v > (1 << 64):
            assert v < FP.p

    walk(st)
    assert mv2.GOLDEN_TIP_STATE_HASH_FIELD < FP.p


def test_to_bridge_state_feeds_the_verifier_slices(golden):
    """The conversion feeds the same hashing/consensus code paths the
    verifier service runs on fixture states."""
    _, st = golden
    bridge = mv2.to_bridge_state(st)
    fields = pm.state_body_fields(bridge)
    assert all(0 <= f < FP.p for f in fields)
    h = pm.host_full_state_hash(bridge)
    assert 0 < h < FP.p
    cs = pm.consensus_from_state(bridge, h)
    assert cs.blockchain_length == 373218
    assert list(cs.sub_window_densities) == list(
        st["body"]["consensus_state"]["sub_window_densities"]
    )


def test_decode_any_picks_the_right_format(golden):
    """decode_protocol_state_any handles both the real wire format and
    the internal fixture layout."""
    blob, st = golden
    real = mt.decode_protocol_state_any(blob)
    assert real == mv2.to_bridge_state(st)
    import random

    from mina_bridge_tpu.bridge import fixtures

    fixture_state = fixtures.make_state(random.Random(7), 1, 2, 3)
    internal = mt.PROTOCOL_STATE.encode(fixture_state)
    assert mt.decode_protocol_state_any(internal) == fixture_state


def test_golden_hash_requires_official_poseidon():
    """The state-hash check against MINA_TIP_STATE_HASH_FIELD
    (constants.rs:23-24) needs Mina's official Poseidon tables — a data
    drop (PARITY.md 'Data drops'). Skip unless the tables are present;
    when they land this test turns on automatically."""
    from mina_bridge_tpu.hash.poseidon_params import is_official, poseidon_spec

    if not is_official(poseidon_spec("fp")):
        pytest.skip("official kimchi Poseidon tables not present (data drop)")
    blob = mv2.golden_tip_bytes()
    bridge = mv2.to_bridge_state(mv2.decode_protocol_state(blob))
    assert pm.host_full_state_hash(bridge) == mv2.GOLDEN_TIP_STATE_HASH_FIELD
