"""Chunked Pickles pipeline at toy scale: the real Proof-of-State shape
(wrap/step domains larger than the SRS, reference README.md:485-486) is
wrap 2^17 / step 2^18 over the 2^16 SRS; these tests run the identical
chunked code path with a monkeypatched 2^9-point "SRS" so the whole
prove_tip -> batch_verify_tips pipeline (step-transcript replay,
deferred-values digest, accumulator re-opening, decider MSM) executes
in seconds.
"""

import copy
import random

import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.curves import PALLAS
from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
from mina_bridge_tpu.pickles import fixtures as pfx
from mina_bridge_tpu.pickles import verifier as pv

TOY_SRS_LOG = 9
TOY_BLOCK_LOG = 11  # wrap c = 4 (the replay gadget needs ~1400 rows)
TOY_STEP_LOG = 10  # step c = 2


def _clear_setup_caches():
    pv._setup.cache_clear()
    pv.wrap_setup.cache_clear()
    pv.step_device_index.cache_clear()


@pytest.fixture(scope="module")
def toy_srs(request):
    """Shrink the SRS so toy domains exceed it (chunked path)."""
    old = pv.SRS_LOG_N
    pv.SRS_LOG_N = TOY_SRS_LOG
    _clear_setup_caches()
    yield
    pv.SRS_LOG_N = old
    _clear_setup_caches()


@pytest.fixture(scope="module")
def toy_tips(toy_srs):
    return [
        pv.prove_tip(
            0x5A5A + 7 * i,
            rng=random.Random(0xF1C5 + i),
            log_n=TOY_BLOCK_LOG,
            step_log_n=TOY_STEP_LOG,
        )
        for i in range(2)
    ]


def rand_weights(B, seed=3):
    rng = random.Random(seed)
    return jnp.asarray(
        np.array(
            [
                [int_to_limbs(rng.randrange(PALLAS.scalar.p), NLIMBS) for _ in range(5)]
                for _ in range(B)
            ],
            np.int32,
        )
    )


def test_chunked_tips_shapes(toy_tips):
    t = toy_tips[0]
    # accumulators fold over the SRS, not the domain
    assert len(t.step_acc_prechals) == TOY_SRS_LOG
    assert len(t.wrap.opening.chals) == TOY_SRS_LOG
    # the wrap proof is chunked 4-ways
    from mina_bridge_tpu.kimchi.prover_host import N_OPENED, as_chunks

    nc = 1 << (TOY_BLOCK_LOG - TOY_SRS_LOG)
    assert len(t.wrap.evals) == N_OPENED * nc
    assert len(as_chunks(t.wrap.w_comm[0])) == nc


def test_chunked_batch_verify_tips(toy_tips):
    dtips = pv.device_proofs(toy_tips)
    ok = pv.batch_verify_tips(
        dtips, rand_weights(2), log_n=TOY_BLOCK_LOG, step_log_n=TOY_STEP_LOG
    )
    assert bool(ok)


def test_chunked_tips_tampered_rejected(toy_tips):
    # tampering the step accumulator breaks the deferred digest binding
    bad = copy.deepcopy(toy_tips)
    bad[1].step_acc_prechals[0] = (bad[1].step_acc_prechals[0] + 1) % PALLAS.scalar.p
    dtips = pv.device_proofs(bad)
    assert not bool(
        pv.batch_verify_tips(
            dtips, rand_weights(2), log_n=TOY_BLOCK_LOG, step_log_n=TOY_STEP_LOG
        )
    )
    # tampering a wrap opening response breaks the wrap verification
    bad2 = copy.deepcopy(toy_tips)
    bad2[0].wrap.opening.z1 = (bad2[0].wrap.opening.z1 + 1) % PALLAS.scalar.p
    dtips2 = pv.device_proofs(bad2)
    assert not bool(
        pv.batch_verify_tips(
            dtips2, rand_weights(2), log_n=TOY_BLOCK_LOG, step_log_n=TOY_STEP_LOG
        )
    )


def test_pickles_fixture_roundtrip(toy_tips, tmp_path):
    circuit, gadget, index, dindex, g, h = pv.wrap_setup(
        TOY_BLOCK_LOG, TOY_STEP_LOG
    )
    _, step_index, _, _, _ = pv.step_setup(TOY_STEP_LOG)
    path = tmp_path / "tips.json.gz"
    pfx.save_tips(
        path, TOY_BLOCK_LOG, TOY_STEP_LOG, toy_tips,
        wrap_index=index, step_index=step_index,
    )
    bln, sln, tips2, idx2, sidx2 = pfx.load_tips(path)
    assert (bln, sln) == (TOY_BLOCK_LOG, TOY_STEP_LOG)
    assert idx2.chunks == index.chunks and idx2.digest() == index.digest()
    assert sidx2.digest() == step_index.digest()
    assert tips2[0].step is not None  # wrapped step proofs round-trip
    # the loaded tips verify through dindexes rebuilt from the DOC alone
    from mina_bridge_tpu.kimchi import verifier as kv

    dindex2 = kv.DeviceVerifierIndex.from_host(
        idx2, *pv._srs_for("pallas", idx2.domain.n)
    )
    step_dindex2 = kv.DeviceVerifierIndex.from_host(
        sidx2, *pv._srs_for("vesta", sidx2.domain.n)
    )
    dtips = pv.device_proofs(tips2)
    assert dtips.step is not None
    ok = pv.batch_verify_tips(
        dtips,
        rand_weights(2),
        log_n=TOY_BLOCK_LOG,
        step_log_n=TOY_STEP_LOG,
        dindex=dindex2,
        step_dindex=step_dindex2,
    )
    assert bool(ok)
