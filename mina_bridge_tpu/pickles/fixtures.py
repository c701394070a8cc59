"""Real-scale Pickles tip-proof fixtures (wrap 2^17 / step 2^18).

The bridge's actual Proof-of-State shape (reference README.md:485-486:
Step domain 2^18 on Vesta, Wrap domain 2^17 on Pallas, both over the
shipped 2^16 SRS via chunked commitments) takes tens of host-proving
minutes to produce, so — like the kimchi 2^16 fixtures
(kimchi/bench_fixtures.py) — the proofs are committed to `fixtures/`
and the driver's benchmark only pays device verification.

A fixture document carries the wrap verifier-index commitments too:
rebuilding them (block_setup at 2^17) costs minutes of host MSM time
that a cold bench machine should not pay.
"""

from __future__ import annotations

import gzip
import json
import pathlib

from ..fields.params import NLIMBS, int_to_limbs
from ..kimchi import bench_fixtures as bf
from ..kimchi import verifier as kv
from . import verifier as pv

_REPO_FIXTURES = pathlib.Path(__file__).resolve().parents[2] / "fixtures"


def fixture_path(block_log_n: int, step_log_n: int, batch: int) -> pathlib.Path:
    return _REPO_FIXTURES / (
        f"pickles_2e{block_log_n}_s2e{step_log_n}_b{batch}.json.gz"
    )


def make_tips(
    block_log_n: int,
    step_log_n: int,
    batch: int,
    state_hashes=None,
    rngs=None,
) -> list[pv.TipProof]:
    """Prove `batch` tips binding distinct state hashes (host; minutes
    at real scale). Each tip = a real Vesta step proof + a Pallas wrap
    proof carrying the deferred-values gadget (pickles.prove_tip)."""
    import random

    if state_hashes is None:
        state_hashes = [0x5A5A + 7 * i for i in range(batch)]
    tips = []
    for i, sh in enumerate(state_hashes):
        rng = rngs[i] if rngs else random.Random(0xF1C5 + i)
        tips.append(
            pv.prove_tip(
                sh, rng=rng, log_n=block_log_n, step_log_n=step_log_n
            )
        )
    return tips


def _tip_doc(tip: pv.TipProof) -> dict:
    doc = {
        "wrap": bf._proof_doc(tip.wrap),
        "acc_prechals": [hex(c) for c in tip.step_acc_prechals],
        "acc_sg": bf._pt(tip.step_acc_sg),
    }
    if tip.step is not None:  # wrapped step proof (D7 device path)
        doc["step"] = bf._proof_doc(tip.step)
    return doc


def _tip_undoc(d: dict) -> pv.TipProof:
    return pv.TipProof(
        wrap=bf._proof_from_doc(d["wrap"]),
        step_acc_prechals=[int(c, 16) for c in d["acc_prechals"]],
        step_acc_sg=bf._unpt(d["acc_sg"]),
        step=bf._proof_from_doc(d["step"]) if "step" in d else None,
    )


def save_tips(
    path: pathlib.Path,
    block_log_n: int,
    step_log_n: int,
    tips: list[pv.TipProof],
    wrap_index=None,
    step_index=None,
) -> None:
    doc = {
        "block_log_n": block_log_n,
        "step_log_n": step_log_n,
        "tips": [_tip_doc(t) for t in tips],
    }
    if wrap_index is not None:
        doc["wrap_index"] = bf._index_doc(wrap_index)
    if step_index is not None:
        doc["step_index"] = bf._index_doc(step_index)
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump(doc, f)


def load_tips(path: pathlib.Path):
    """-> (block_log_n, step_log_n, [TipProof], wrap_host_index|None,
    step_host_index|None)."""
    with gzip.open(path, "rt") as f:
        doc = json.load(f)
    tips = [_tip_undoc(td) for td in doc["tips"]]
    index = None
    if "wrap_index" in doc:
        index = bf._index_from_doc(doc["wrap_index"], pv.PALLAS)
    step_index = None
    if "step_index" in doc:
        step_index = bf._index_from_doc(doc["step_index"], pv.VESTA)
    return doc["block_log_n"], doc["step_log_n"], tips, index, step_index


def load_wrap_dindex(block_log_n: int, step_log_n: int, batch: int):
    """Device wrap index from the committed fixture (skips the
    block_setup commitment recomputation); None when no fixture."""
    path = fixture_path(block_log_n, step_log_n, batch)
    if not path.exists():
        return None
    _, _, _, host_index, _ = load_tips(path)
    if host_index is None:
        return None
    g, h = pv._srs_for("pallas", host_index.domain.n)
    return kv.DeviceVerifierIndex.from_host(host_index, g, h)


def load_step_dindex(block_log_n: int, step_log_n: int, batch: int):
    """Device STEP (Vesta) index from the committed fixture (skips the
    step_setup commitment recomputation); None when absent."""
    path = fixture_path(block_log_n, step_log_n, batch)
    if not path.exists():
        return None
    _, _, _, _, host_index = load_tips(path)
    if host_index is None:
        return None
    g, h = pv._srs_for("vesta", host_index.domain.n)
    return kv.DeviceVerifierIndex.from_host(host_index, g, h)
