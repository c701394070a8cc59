"""Bridge semantic layers: codecs, consensus, hashing, merkle, sol codec."""

import random

import pytest

from mina_bridge_tpu.bridge import (
    base58,
    binprot as bp,
    consensus,
    fixtures,
    keccak,
    merkle,
    mina_types as mt,
    proof_model as pm,
    sol_codec,
)
from mina_bridge_tpu.fields.params import FP


@pytest.fixture
def prng():
    return random.Random(0xB1D6E)


def test_keccak_vectors():
    assert (
        keccak.keccak256(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert (
        keccak.keccak256(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert keccak.selector("transfer(address,uint256)").hex() == "a9059cbb"


def test_base58_roundtrip(prng):
    for version in (base58.VERSION_STATE_HASH, base58.VERSION_LEDGER_HASH):
        payload = prng.randbytes(33)
        s = base58.b58check_encode(payload, version)
        assert base58.b58check_decode(s, version) == payload
    v = prng.randrange(FP.p)
    assert base58.b58_to_field(
        base58.state_hash_to_b58(v), base58.VERSION_STATE_HASH
    ) == v


def test_binprot_primitives():
    for n in [0, 1, 0x7F, 0x80, 0x1234, -1, -200, 1 << 40, -(1 << 40)]:
        data = bp.write_int(n)
        got, off = bp.read_int(data, 0)
        assert (got, off) == (n, len(data))
    for desc, val in [
        (bp.Option(bp.Int()), None),
        (bp.Option(bp.Int()), 42),
        (bp.List(bp.Field()), [1, 2, FP.p - 1]),
        (bp.Variant(("A", []), ("B", [bp.Int()])), ("B", [7])),
        (bp.Str(), "hello"),
    ]:
        assert desc.decode(desc.encode(val)) == val


def test_protocol_state_roundtrip(prng):
    st = fixtures.make_state(prng, 123, 100, 1000)
    blob = mt.PROTOCOL_STATE.encode(st)
    assert mt.PROTOCOL_STATE.decode(blob) == st


def test_account_roundtrip(prng):
    for with_zkapp in (True, False):
        acc = fixtures.make_account(prng, with_zkapp)
        blob = mt.ACCOUNT.encode(acc)
        assert mt.ACCOUNT.decode(blob) == acc
        enc = sol_codec.encode_account_sol(acc)
        assert len(enc) % 32 == 0
        assert sol_codec.encode_account_sol(acc) == enc  # deterministic


def test_consensus_rules(prng):
    states, tip = fixtures.make_chain(prng)
    cand = pm.consensus_from_state(states[-1], 1)
    tipc = pm.consensus_from_state(tip, 2)
    assert consensus.is_short_range(cand, tipc)
    assert consensus.candidate_wins(tipc, cand)
    # shorter candidate loses
    short = pm.consensus_from_state(states[0], 3)
    short.blockchain_length = tipc.blockchain_length - 5
    assert not consensus.candidate_wins(tipc, short)
    # long-range: different lock checkpoints -> density rule
    lr = fixtures.make_state(prng, 1, 1000, 5000, lock_checkpoint=999)
    lrc = pm.consensus_from_state(lr, 4)
    assert not consensus.is_short_range(lrc, tipc)
    lrc.min_window_density = 1000  # denser candidate wins long-range
    assert consensus.candidate_wins(tipc, lrc)
    # sparse candidate at a comparable slot loses to a denser tip
    lrc.min_window_density = 1
    lrc.global_slot = tipc.global_slot
    tipc.min_window_density = 50
    tipc.sub_window_densities = [50] * consensus.SUB_WINDOWS_PER_WINDOW
    assert not consensus.candidate_wins(tipc, lrc)


def test_projected_window():
    st = pm.consensus_from_state(
        fixtures.make_state(random.Random(0), 1, 10, 77), 0
    )
    st.sub_window_densities = list(range(consensus.SUB_WINDOWS_PER_WINDOW))
    # projecting far ahead rings in all zeros except the most recent
    proj = consensus.project_window(st, st.global_slot + 7 * 100)
    assert sum(proj) <= sum(st.sub_window_densities)


def test_merkle_host_device(prng):
    ledger = fixtures.SparseLedger(depth=8)
    leaves = {3: prng.randrange(FP.p), 6: prng.randrange(FP.p)}
    for idx, leaf in leaves.items():
        ledger.set_leaf(idx, leaf)
    root = ledger.root()
    import jax.numpy as jnp
    import numpy as np

    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs, limbs_to_int

    for idx, leaf in leaves.items():
        path = ledger.path(idx)
        assert merkle.host_merkle_root(leaf, [(s, h[0]) for s, h in path], 8) == root
        dev_root = merkle.device_merkle_roots(
            jnp.asarray(int_to_limbs(leaf, NLIMBS))[None],
            jnp.asarray(np.stack([int_to_limbs(h[0], NLIMBS) for _, h in path]))[None],
            jnp.asarray(
                np.array([[1 if s == "Left" else 0 for s, _ in path]], np.int32)
            ),
        )
        assert limbs_to_int(np.asarray(dev_root[0])) == root


def test_state_proof_model_roundtrip(prng):
    pub, proof, states, tip = fixtures.make_state_proof(prng)
    assert pm.MinaStatePubInputs.decode(pub.encode()) == pub
    assert pm.MinaStateProof.decode(proof.encode()) == proof
    # device-hashed chain linkage matches host hashing
    assert pub.candidate_chain_state_hashes[0] == pm.host_full_state_hash(states[0])


def test_mina_signer_roundtrip(prng):
    from mina_bridge_tpu.bridge import mina_signer as ms

    kp = ms.Keypair(secret=prng.randrange(1, 2**200))
    addr = kp.address
    assert ms.decode_address(addr) == kp.public
    msg = [prng.randrange(100) for _ in range(3)]
    sig = ms.sign(kp, msg)
    assert ms.verify(kp.public, msg, sig)
    assert not ms.verify(kp.public, [msg[0] + 1] + msg[1:], sig)
    other = ms.Keypair(secret=kp.secret + 1)
    assert not ms.verify(other.public, msg, sig)


def test_batch_merkle_inclusion(prng):
    from mina_bridge_tpu.bridge import aligned as al

    leaves = [prng.randbytes(32) for _ in range(5)]
    root, proofs = al.build_batch_merkle(leaves)
    for i, leaf in enumerate(leaves):
        assert al.verify_batch_inclusion(leaf, proofs[i], i, root)
    assert not al.verify_batch_inclusion(leaves[0], proofs[1], 1, root)
