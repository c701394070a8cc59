"""End-to-end bridge flow: fixture Mina node -> TPU verifier service ->
mock Ethereum settlement, through the real SDK/clients (signing, ABI,
GraphQL documents). The submit-state and submit-account equivalents of
the reference call stacks (SURVEY §3.1, §3.2)."""

import random

import pytest

from mina_bridge_tpu.bridge import aligned as al
from mina_bridge_tpu.bridge import eth as ethmod
from mina_bridge_tpu.bridge import fixtures
from mina_bridge_tpu.bridge import mina_graphql as mg
from mina_bridge_tpu.bridge import mina_types as mt
from mina_bridge_tpu.bridge import proof_model as pm
from mina_bridge_tpu.sdk import BridgeSdk
from tests.mock_chain import MockEthNode, MockMinaNode


@pytest.fixture(scope="module")
def world():
    rng = random.Random(0xE2E)
    states, tip_state = fixtures.make_chain(rng)
    tip_hash = pm.host_full_state_hash(tip_state)
    state_blobs = [mt.PROTOCOL_STATE.encode(s) for s in states]

    # the node serves the candidate tip's Pickles proof as a binprot
    # blob (MinaBaseProofStableV2 counterpart, bridge/pickles_wire.py);
    # the SDK decodes it from the envelope — no out-of-band tip proof
    from mina_bridge_tpu.bridge import pickles_wire as pw
    from mina_bridge_tpu.pickles import verifier as pickles

    tip_proof = pickles.prove_tip(pm.host_full_state_hash(states[-1]))
    eth_node = MockEthNode(root_state_hash=tip_hash)
    mina_node = MockMinaNode(state_blobs, pw.encode_tip_proof(tip_proof))

    wallet = ethmod.Wallet(0xA11CE)
    eth = ethmod.EthClient(eth_node, chain_id=31337, wallet=wallet)
    service = al.TpuVerifierService(on_batch_root=eth_node.post_batch_root)
    sdk = BridgeSdk(
        mina=mg.MinaClient(mina_node),
        eth=eth,
        service=service,
        state_contract=ethmod.StateSettlementContract(
            eth, eth_node.state_contract_addr
        ),
        account_contract=ethmod.AccountValidationContract(
            eth, eth_node.account_contract_addr
        ),
    )
    return rng, states, tip_state, eth_node, mina_node, sdk


def test_submit_state_e2e(world):
    rng, states, tip_state, eth_node, mina_node, sdk = world

    cand_tip_hash = pm.host_full_state_hash(states[-1])
    tip_bytes = mt.PROTOCOL_STATE.encode(tip_state)

    # no tip_proof argument: the SDK decodes it from the node-served
    # envelope (wire codec round-trip onto device); no rand_weights:
    # exercises the service's own OS-entropy sampling
    updated = sdk.update_bridge_chain(tip_bytes)
    assert updated
    # on-chain frontier now matches the candidate chain
    assert eth_node.state.state_hashes == [
        pm.host_full_state_hash(s) for s in states
    ]
    # idempotence: second submission is skipped (sdk.rs:101-106)
    assert sdk.get_bridged_chain_tip_state_hash() == cand_tip_hash


def test_submit_account_e2e(world):
    rng, states, tip_state, eth_node, mina_node, sdk = world
    account = fixtures.make_account(rng)
    acc_bytes = mt.ACCOUNT.encode(account)
    leaf = pm.host_account_hash(account)
    ledger = fixtures.SparseLedger()
    ledger.set_leaf(5, leaf)
    path = ledger.path(5)
    root = ledger.root()
    mina_node.add_account("B62fixture", acc_bytes, path, root)

    data = sdk.validate_account("B62fixture", hex(pm.host_full_state_hash(states[-1])))
    assert eth_node.account.validated
    assert data.verification.index_in_batch == 0


def test_rejects_bad_state_proof(world):
    rng, states, tip_state, eth_node, mina_node, sdk = world
    from mina_bridge_tpu.bridge import verifier_service as vs
    from mina_bridge_tpu.pickles import verifier as pickles
    from tests.test_kimchi_device import rand_weights
    from mina_bridge_tpu.curves import PALLAS

    pub, proof = mg.get_mina_proof_of_state(
        sdk.mina, mt.PROTOCOL_STATE.encode(tip_state)
    )
    pub.candidate_chain_state_hashes[3] ^= 1
    tip_proof = pickles.prove_tip(pub.candidate_chain_state_hashes[-1])
    res = vs.verify_proof_of_state(
        pub, proof, pickles.BLOCK_LOG_N, pickles.device_proofs([tip_proof]),
        rand_weights(PALLAS, 1, n=5),
    )
    assert not res.ok and "state hash" in res.reason
