"""The REAL MinaBaseProofStableV2 layout (bridge/mina_proof_v2.py):
synthetic-blob round-trips, the adapter onto our proof model, and the
golden-blob gate that turns on when a captured node proof lands
(reference core/src/mina.rs:235-248)."""

import pathlib
import random

import pytest

from mina_bridge_tpu.bridge import mina_proof_v2 as mp2

PARAMS_DIR = pathlib.Path(__file__).resolve().parents[1] / "params"


def _sc(rng):
    return {"inner": [rng.getrandbits(63), rng.getrandbits(63)]}


def _bp_chal(rng):
    return {"prechallenge": _sc(rng)}


def _pt(rng):
    return (rng.getrandbits(254), rng.getrandbits(254))


def _chunked(rng, nc=1):
    return ([rng.getrandbits(254) for _ in range(nc)],
            [rng.getrandbits(254) for _ in range(nc)])


def _pair(rng):
    return (rng.getrandbits(254), rng.getrandbits(254))


def synthetic_proof_doc(seed=0xD00D):
    """A fully-populated real-layout value with deterministic contents."""
    rng = random.Random(seed)
    opt_cols = dict.fromkeys(
        (
            "range_check0_selector", "range_check1_selector",
            "foreign_field_add_selector", "foreign_field_mul_selector",
            "xor_selector", "rot_selector", "lookup_aggregation",
            "lookup_table", "runtime_lookup_table",
            "runtime_lookup_table_selector", "xor_lookup_selector",
            "lookup_gate_lookup_selector", "range_check_lookup_selector",
            "foreign_field_mul_lookup_selector",
        )
    )
    return {
        "statement": {
            "proof_state": {
                "deferred_values": {
                    "plonk": {
                        "alpha": _sc(rng),
                        "beta": [rng.getrandbits(63), rng.getrandbits(63)],
                        "gamma": [rng.getrandbits(63), rng.getrandbits(63)],
                        "zeta": _sc(rng),
                        "joint_combiner": None,
                        "feature_flags": {
                            k: False
                            for k, _ in mp2.FEATURE_FLAGS.fields
                        },
                    },
                    "bulletproof_challenges": [
                        _bp_chal(rng) for _ in range(16)
                    ],
                    "branch_data": {
                        "proofs_verified": ("N2", []),
                        "domain_log2": 17,
                    },
                },
                "sponge_digest_before_evaluations": [
                    rng.getrandbits(63) for _ in range(4)
                ],
                "messages_for_next_wrap_proof": {
                    "challenge_polynomial_commitment": _pt(rng),
                    "old_bulletproof_challenges": [
                        [_bp_chal(rng) for _ in range(15)] for _ in range(2)
                    ],
                },
            },
            "messages_for_next_step_proof": {
                "app_state": None,
                "challenge_polynomial_commitments": [_pt(rng), _pt(rng)],
                "old_bulletproof_challenges": [
                    [_bp_chal(rng) for _ in range(16)] for _ in range(2)
                ],
            },
        },
        "prev_evals": {
            "evals": {
                "public_input": _pair(rng),
                "evals": {
                    "w": [_chunked(rng) for _ in range(15)],
                    "coefficients": [_chunked(rng) for _ in range(15)],
                    "z": _chunked(rng),
                    "s": [_chunked(rng) for _ in range(6)],
                    "generic_selector": _chunked(rng),
                    "poseidon_selector": _chunked(rng),
                    "complete_add_selector": _chunked(rng),
                    "mul_selector": _chunked(rng),
                    "emul_selector": _chunked(rng),
                    "endomul_scalar_selector": _chunked(rng),
                    "lookup_sorted": [None] * 5,
                    **opt_cols,
                },
            },
            "ft_eval1": rng.getrandbits(254),
        },
        "proof": {
            "commitments": {
                "w_comm": [_pt(rng) for _ in range(15)],
                "z_comm": _pt(rng),
                "t_comm": [_pt(rng) for _ in range(7)],
            },
            "evaluations": {
                "w": [_pair(rng) for _ in range(15)],
                "coefficients": [_pair(rng) for _ in range(15)],
                "z": _pair(rng),
                "s": [_pair(rng) for _ in range(6)],
                "generic_selector": _pair(rng),
                "poseidon_selector": _pair(rng),
                "complete_add_selector": _pair(rng),
                "mul_selector": _pair(rng),
                "emul_selector": _pair(rng),
                "endomul_scalar_selector": _pair(rng),
            },
            "ft_eval1": rng.getrandbits(254),
            "bulletproof": {
                "lr": [(_pt(rng), _pt(rng)) for _ in range(16)],
                "z_1": rng.getrandbits(254),
                "z_2": rng.getrandbits(254),
                "delta": _pt(rng),
                "challenge_polynomial_commitment": _pt(rng),
            },
        },
    }


def _normalize(v):
    """Tuples and lists are the same bin_prot value; compare as lists."""
    if isinstance(v, tuple):
        return [_normalize(x) for x in v]
    if isinstance(v, list):
        return [_normalize(x) for x in v]
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    return v


def test_synthetic_roundtrip_bytes():
    doc = synthetic_proof_doc()
    blob = mp2.encode_proof(doc)
    doc2 = mp2.decode_proof(blob)
    assert mp2.encode_proof(doc2) == blob, "re-encode not byte-identical"
    assert _normalize(doc2) == _normalize(doc)


def test_version_and_malformed_rejected():
    doc = synthetic_proof_doc(1)
    blob = mp2.encode_proof(doc)
    # version byte flips -> rejected (MinaBaseProofStableV2 is version 2)
    with pytest.raises(Exception):
        mp2.decode_proof(b"\x01" + blob[1:])
    with pytest.raises(Exception):
        mp2.decode_proof(b"")
    with pytest.raises(Exception):
        mp2.decode_proof(blob[:-5])  # truncated


def test_real_layout_lands_on_device():
    """A real-layout blob decodes all the way to DeviceTips — the
    structural half of VERDICT r4 item 5 (verification of a real proof
    additionally needs the wrap-index + Poseidon data drops)."""
    docs = [mp2.decode_proof(mp2.encode_proof(synthetic_proof_doc(s)))
            for s in (2, 3)]
    dtips = mp2.real_tip_to_device(docs)
    B = 2
    assert dtips.wrap.w_comm.shape[0] == B
    assert dtips.acc_prechals.shape[:2] == (B, 16)
    assert dtips.acc_sg.shape[:2] == (B, 2)
    assert dtips.step is None  # real wire defers the step side
    # the adapter preserved the bulletproof geometry
    hp = mp2.wrap_wire_to_host_proof(docs[0])
    src = synthetic_proof_doc(2)
    assert hp.opening.sg == tuple(
        src["proof"]["bulletproof"]["challenge_polynomial_commitment"]
    )
    assert len(hp.opening.lr) == 16
    assert len(hp.evals) == 56
    assert len(hp.prev_challenges) == 2


def test_golden_real_blob_decodes():
    """Byte-level exactness gate: turns on when a captured node proof
    blob lands (params/golden_tip_proof.bin data drop, same policy as
    the Poseidon tables)."""
    blob_path = PARAMS_DIR / "golden_tip_proof.bin"
    if not blob_path.exists():
        pytest.skip("params/golden_tip_proof.bin missing (data drop)")
    blob = blob_path.read_bytes()
    doc = mp2.decode_proof(blob)
    assert mp2.encode_proof(doc) == blob
    mp2.real_tip_to_device([doc])
