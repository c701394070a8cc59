"""The params-keyed GOLDEN bit-exactness matrix (VERDICT r4 item 9).

Every Poseidon-derived bit-exactness gate in the stack, enumerable with
`pytest -k golden`, evaluated against BOTH parameter sets:

  * GENERATED (the in-repo Grain-LFSR fallback tables,
    hash/poseidon_params.py): expected values are pinned below, so any
    accidental change to the sponge/permutation/prefix plumbing — the
    code every layer from state hashing to the wrap gadget shares —
    fails here first, with the gate named.
  * OFFICIAL (the mina-poseidon kimchi tables, a zero-egress-blocked
    data drop): each gate skips on exactly one missing file. Landing
    the drop is a pure data change:
      params/poseidon_fp_kimchi.json   (fp round constants + MDS)
      params/poseidon_fq_kimchi.json   (fq round constants + MDS)
      params/golden_vectors.json       (official expected values for the
                                        gates below, keyed by gate name;
                                        the state-hash gate needs no
                                        vector file — its expected value
                                        is the reference's
                                        MINA_TIP_STATE_HASH_FIELD,
                                        constants.rs:23-24)
    Drop the three files and the whole matrix flips to mainnet-exact
    with instant pass/fail — no code changes (PARITY.md "Data drops").

The four gates cover the four consumers of the sponge:
  state_hash        — protocol-state hashing (prefix chain + body fold)
  account_hash      — account leaf hashing (Proof-of-Account)
  kimchi_transcript — the Fiat-Shamir fq sponge (verifier challenges)
  pickles_digest    — the deferred-values digest (wrap public input)
"""

import json
import pathlib

import pytest

PARAMS_DIR = pathlib.Path(__file__).resolve().parents[1] / "params"


def _gate_state_hash():
    from mina_bridge_tpu.bridge import mina_state_v2 as mv2
    from mina_bridge_tpu.bridge import proof_model as pm

    blob = mv2.golden_tip_bytes()
    bridge = mv2.to_bridge_state(mv2.decode_protocol_state(blob))
    return pm.host_full_state_hash(bridge)


def _gate_account_hash():
    from mina_bridge_tpu.bridge.state_hash import (
        PREFIX_ACCOUNT,
        host_hash_with_prefix,
    )

    return host_hash_with_prefix(PREFIX_ACCOUNT, [3, 1, 4, 1, 5, 9, 2, 6])


def _gate_kimchi_transcript():
    from mina_bridge_tpu.hash.poseidon import HostSponge
    from mina_bridge_tpu.hash.poseidon_params import poseidon_spec

    sp = HostSponge(poseidon_spec("fq"))
    for v in (11, 22, 33, 44, 55):
        sp.absorb(v)
    return (sp.squeeze() << 256) | sp.squeeze()


def _gate_pickles_digest():
    from mina_bridge_tpu.pickles.verifier import deferred_digest_host

    prechals = [(1 << i) + 17 for i in range(16)]
    return deferred_digest_host(prechals, (123456789, 987654321))


GATES = {
    "state_hash": _gate_state_hash,
    "account_hash": _gate_account_hash,
    "kimchi_transcript": _gate_kimchi_transcript,
    "pickles_digest": _gate_pickles_digest,
}

# pinned against the GENERATED parameter set (recompute only if the
# sponge/permutation/prefix machinery changes INTENTIONALLY)
GENERATED_EXPECTED = {
    "state_hash": 0xA0518D6FE1C2730D0525036248FEDDD402851570AA4F4E9ECFAA44447988A6D,
    "account_hash": 0x181F8822B3611EEED8F2BE349F75BABFFE80BCDAB0B4FA45576498D52A9CF2EB,
    "kimchi_transcript": (
        0x2C443419C4D621ACEF86D6DBF0B11C261F150F4ABBC1BC7F8209EF26C7938735
        << 256
    )
    | 0x3084A86B61E3F058C560C9208536CA68AF45EA5C261D056C70FD3170379AC9FF,
    "pickles_digest": 0x3D29476B0C84263D59D1BF768DBC9C7D5AC0C7F9FD95B9357DD947CC68ED647E,
}


def _official_tables_missing():
    """Name of the FIRST missing official-table file, or None."""
    for f in ("poseidon_fp_kimchi.json", "poseidon_fq_kimchi.json"):
        if not (PARAMS_DIR / f).exists():
            return f"params/{f}"
    return None


@pytest.mark.parametrize("gate", sorted(GATES))
def test_golden_generated(gate):
    from mina_bridge_tpu.hash.poseidon_params import is_official, poseidon_spec

    if is_official(poseidon_spec("fp")):
        pytest.skip("official tables present; generated pins not applicable")
    assert GATES[gate]() == GENERATED_EXPECTED[gate], (
        f"golden gate '{gate}' drifted under the GENERATED parameter set: "
        "the shared sponge/prefix machinery changed"
    )


@pytest.mark.parametrize("gate", sorted(GATES))
def test_golden_official(gate):
    missing = _official_tables_missing()
    if missing:
        pytest.skip(f"{missing} missing (official-tables data drop)")
    if gate == "state_hash":
        # the official expected value ships WITH the reference
        from mina_bridge_tpu.bridge import mina_state_v2 as mv2

        assert GATES[gate]() == mv2.GOLDEN_TIP_STATE_HASH_FIELD
        return
    vec_path = PARAMS_DIR / "golden_vectors.json"
    if not vec_path.exists():
        pytest.skip("params/golden_vectors.json missing (data drop)")
    vectors = {k: int(v, 0) for k, v in json.loads(vec_path.read_text()).items()}
    assert GATES[gate]() == vectors[gate]
