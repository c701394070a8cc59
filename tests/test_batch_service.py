"""Mixed valid/invalid proof batches through the batched serving path.

The reference's operator model verifies each batch entry independently
(README.md:213-215): one bad submission must neither mask nor poison the
verdict of any other proof in the batch. These tests drive
verify_states_batch / verify_accounts_batch — the TpuVerifierService
serving path — with adversarial mixes and assert per-proof verdicts.

Device shapes stay canonical: every tip-verify dispatch (full batch and
the bisection subsets) is padded to the B=2 wrap-verify shape already
compiled by the e2e tests.
"""

import copy
import random

import pytest

from mina_bridge_tpu.bridge import aligned as al
from mina_bridge_tpu.bridge import fixtures
from mina_bridge_tpu.bridge import mina_types as mt
from mina_bridge_tpu.bridge import proof_model as pm
from mina_bridge_tpu.bridge import verifier_service as vs
from mina_bridge_tpu.curves import PALLAS


def rand_weights(batch):
    from tests.test_kimchi_device import rand_weights as rw

    return rw(PALLAS, batch, n=5)


@pytest.fixture(scope="module")
def state_pair():
    """Two independent, individually valid proof-of-state fixtures."""
    from mina_bridge_tpu.pickles import verifier as pickles

    out = []
    for seed in (0xBA7C, 0xBA7C + 1):
        rng = random.Random(seed)
        pub, proof, states, tip_state = fixtures.make_state_proof(rng)
        tip = pickles.prove_tip(pub.candidate_chain_state_hashes[-1])
        out.append((pub, proof, tip))
    return out


def _corrupt_tip(tip):
    """A tip proof that passes every host-side check (public inputs are
    untouched) but fails device verification: z1 is not the correct IPA
    response for the transcript."""
    bad = copy.deepcopy(tip)
    bad.wrap.opening.z1 = (bad.wrap.opening.z1 + 1) % PALLAS.scalar.p
    return bad


def test_mixed_batch_tip_failure_isolated(state_pair):
    """One device-invalid tip in a batch: the other proof still verifies,
    the bad one is rejected (exercises the bisection path)."""
    from mina_bridge_tpu.pickles import verifier as pickles

    (pub_a, proof_a, tip_a), (pub_b, proof_b, tip_b) = state_pair
    dtips = pickles.device_proofs([tip_a, _corrupt_tip(tip_b)])
    results = vs.verify_states_batch(
        [pub_a, pub_b],
        [proof_a, proof_b],
        pickles.BLOCK_LOG_N,
        dtips,
        rand_weights(2),
    )
    assert results[0].ok
    assert not results[1].ok and results[1].reason == "tip proof invalid"


def test_mixed_batch_host_failure_isolated(state_pair):
    """A host-check failure (malformed pub input) in one entry does not
    skip or fail the other entry's tip verification — the round-1
    soundness hole (one malformed proof used to make every other tip
    proof in the batch pass unverified)."""
    from mina_bridge_tpu.pickles import verifier as pickles

    (pub_a, proof_a, tip_a), (pub_b, proof_b, tip_b) = state_pair
    bad_pub = copy.deepcopy(pub_b)
    bad_pub.candidate_chain_state_hashes[3] ^= 1
    # the adversarial pairing: the host-failing proof rides with a
    # DEVICE-invalid tip on the other entry; both must be rejected
    dtips = pickles.device_proofs([_corrupt_tip(tip_a), tip_b])
    results = vs.verify_states_batch(
        [pub_a, bad_pub],
        [proof_a, proof_b],
        pickles.BLOCK_LOG_N,
        dtips,
        rand_weights(2),
    )
    assert not results[0].ok and results[0].reason == "tip proof invalid"
    assert not results[1].ok and "state hash" in results[1].reason


def test_service_batch_submission(state_pair):
    """TpuVerifierService.submit_states: per-proof verdicts, only the
    valid proof joins the pending batch."""
    from mina_bridge_tpu.pickles import verifier as pickles

    (pub_a, proof_a, tip_a), (pub_b, proof_b, tip_b) = state_pair
    service = al.TpuVerifierService(block_log_n=pickles.BLOCK_LOG_N)
    results = service.submit_states(
        [pub_a, pub_b],
        [proof_a, proof_b],
        [tip_a, _corrupt_tip(tip_b)],
        rand_weights(2),
    )
    assert [r.ok for r in results] == [True, False]
    assert len(service.pending) == 1
    data = service.finalize_batch()
    assert data[0].index_in_batch == 0


def test_service_samples_own_randomness(state_pair, monkeypatch):
    """Production path (no rand_weights argument): the service must
    sample its own verifier randomness via system_rand_weights (OS
    entropy), after the proofs are in hand — the PARITY D11 soundness
    precondition. Callers supplying weights is a test-only seam."""
    from mina_bridge_tpu.pickles import verifier as pickles

    (pub_a, proof_a, tip_a), _ = state_pair
    calls = []
    real = vs.system_rand_weights

    def spy(batch):
        calls.append(batch)
        return real(batch)

    monkeypatch.setattr(vs, "system_rand_weights", spy)
    service = al.TpuVerifierService(block_log_n=pickles.BLOCK_LOG_N)
    results = service.submit_states([pub_a], [proof_a], [tip_a])
    assert calls == [1]
    assert results[0].ok


def test_system_rand_weights_entropy():
    """system_rand_weights really uses OS entropy: two draws differ and
    values are canonical limb arrays below the field moduli."""
    from mina_bridge_tpu.curves import PALLAS, VESTA
    from mina_bridge_tpu.fields.params import limbs_to_int
    import numpy as np

    a = np.asarray(vs.system_rand_weights(2))
    b = np.asarray(vs.system_rand_weights(2))
    # (B, 5): wrap (w, rho), legacy decider, step (w, rho)
    assert a.shape == (2, 5, a.shape[-1])
    assert not np.array_equal(a, b)
    mods = (
        PALLAS.scalar.p,
        PALLAS.scalar.p,
        VESTA.scalar.p,
        VESTA.scalar.p,
        VESTA.scalar.p,
    )
    for arr in (a, b):
        for bi in range(2):
            for j, m in enumerate(mods):
                assert limbs_to_int(arr[bi, j]) < m


def _account_fixture(rng, index, with_zkapp):
    account = fixtures.make_account(rng, with_zkapp=with_zkapp)
    ledger = fixtures.SparseLedger()
    ledger.set_leaf(index, pm.host_account_hash(account))
    from mina_bridge_tpu.bridge.sol_codec import encode_account_sol

    pub = pm.MinaAccountPubInputs(
        ledger_hash=ledger.root(), encoded_account=encode_account_sol(account)
    )
    proof = pm.MinaAccountProof(
        merkle_path=ledger.path(index), account=mt.ACCOUNT.encode(account)
    )
    return pub, proof


def test_account_batch_mixed_lengths(rng):
    """Accounts with different field-vector lengths (zkApp vs plain) in
    one batch: each leaf hash must equal the single-proof hash (the
    round-1 bug zero-padded shorter accounts to the batch max, silently
    changing their Poseidon input)."""
    pairs = [
        _account_fixture(rng, 3, with_zkapp=True),
        _account_fixture(rng, 4, with_zkapp=False),
        _account_fixture(rng, 5, with_zkapp=True),
    ]
    pubs = [p for p, _ in pairs]
    proofs = [q for _, q in pairs]
    # sanity: the batch really mixes lengths
    accounts = [mt.ACCOUNT.decode(q.account) for q in proofs]
    lens = {len(pm.account_fields(a)) for a in accounts}
    assert len(lens) == 2
    results = vs.verify_accounts_batch(pubs, proofs)
    assert all(r.ok for r in results), [r.reason for r in results]
    # per-proof verdicts with one wrong ledger hash mixed in
    bad = copy.deepcopy(pubs[1])
    bad.ledger_hash ^= 1
    results = vs.verify_accounts_batch([pubs[0], bad, pubs[2]], proofs)
    assert [r.ok for r in results] == [True, False, True]
