"""bench_fixtures: real-scale verifier fixture machinery (host-side).

Device verification of the committed 2^16 fixture happens in bench.py on
the TPU (new device shapes cost 10-40 min of CPU XLA compile; see
CLAUDE.md) — these tests pin the host-side protocol + serialization.
"""

import copy
import random

import pytest

from mina_bridge_tpu.curves.host import PALLAS
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.kimchi import bench_fixtures as bf, prover_host


@pytest.fixture(scope="module")
def small_fixture():
    index, proofs = bf.make_fixture(5, 2, n_gates=8)
    return index, proofs


def test_chain_proofs_host_verify(small_fixture):
    index, proofs = small_fixture
    g, h = srs_points_host("pallas", index.domain.n)
    for pr in proofs:
        assert prover_host.host_verify(index, pr, g, h)


def test_chain_proof_tamper_rejected(small_fixture):
    index, proofs = small_fixture
    g, h = srs_points_host("pallas", index.domain.n)
    fs = PALLAS.scalar
    bad = copy.deepcopy(proofs[0])
    bad.public = [(bad.public[0] + 1) % fs.p]
    assert not prover_host.host_verify(index, bad, g, h)
    bad2 = copy.deepcopy(proofs[0])
    e0, e1 = bad2.evals[0]
    bad2.evals[0] = ((e0 + 1) % fs.p, e1)
    assert not prover_host.host_verify(index, bad2, g, h)


def test_fixture_roundtrip(tmp_path, small_fixture):
    index, proofs = small_fixture
    path = tmp_path / "fx.json.gz"
    bf.save_fixture(path, index, proofs)
    i2, p2 = bf.load_fixture(path)
    assert i2.domain.n == index.domain.n
    assert i2.npub == index.npub
    assert i2.shifts == tuple(index.shifts)
    assert i2.digest() == index.digest()  # commitments byte-identical
    for a, b in zip(proofs, p2):
        assert [tuple(e) for e in a.evals] == [tuple(e) for e in b.evals]
        assert tuple(a.opening.sg) == tuple(b.opening.sg)
        assert a.opening.chals == b.opening.chals
        assert a.public == b.public
    # the loaded index must still verify the loaded proofs
    g, h = srs_points_host("pallas", i2.domain.n)
    assert prover_host.host_verify(i2, p2[0], g, h)


def test_committed_fixture_loads():
    """The repo-committed 2^16 fixture parses and is structurally sound."""
    path = bf.fixture_path(16, 2)
    if not path.exists():
        pytest.skip("2^16 fixture not generated yet")
    index, proofs = bf.load_fixture(path)
    assert index.domain.n == 1 << 16
    assert len(proofs) == 2
    assert len(proofs[0].opening.lr) == 16  # k = log n rounds
    assert index.digest() > 0
