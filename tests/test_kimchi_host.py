"""Host PLONK prover <-> host verifier roundtrip (fixture engine)."""

import random

import pytest

from mina_bridge_tpu.curves import PALLAS
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.kimchi import prover_host
from mina_bridge_tpu.kimchi.circuit import COLUMNS, CircuitBuilder

LOG_N = 4  # 16-row domain


def build_example():
    """Circuit: public out == x*y + x for private x, y."""
    curve = PALLAS
    fs = curve.scalar
    b = CircuitBuilder(fs, LOG_N)
    pub_cell = b.public_input()
    m_a, m_b, m_c = b.mul_gate()  # x*y = t
    a_a, a_b, a_c = b.add_gate()  # t + x = out
    b.connect([m_a, a_b])  # x reused
    b.connect([m_c, a_a])  # t flows
    b.connect([a_c, pub_cell])  # out is public
    circuit = b.build()

    def witness_for(x, y):
        p = fs.p
        t = x * y % p
        out = (t + x) % p
        n = circuit.n
        w = [[0] * n for _ in range(COLUMNS)]
        # row 0: public
        w[0][0] = out
        # row 1: mul gate
        w[0][1], w[1][1], w[2][1] = x, y, t
        # row 2: add gate
        w[0][2], w[1][2], w[2][2] = t, x, out
        return w, [out]

    return curve, circuit, witness_for


@pytest.fixture(scope="module")
def proven():
    curve, circuit, witness_for = build_example()
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, curve, g, h)
    rng = random.Random(99)
    proofs = []
    for x, y in [(3, 5), (7, 11)]:
        w, pub = witness_for(x, y)
        proofs.append(prover_host.prove(index, circuit, w, pub, g, h, rng))
    return curve, circuit, index, g, h, proofs


def test_host_prove_verify(proven):
    curve, circuit, index, g, h, proofs = proven
    for proof in proofs:
        assert prover_host.host_verify(index, proof, g, h)


def test_host_reject_bad_public(proven):
    curve, circuit, index, g, h, proofs = proven
    import dataclasses

    bad = dataclasses.replace(proofs[0], public=[123456])
    assert not prover_host.host_verify(index, bad, g, h)


def test_host_reject_tampered_eval(proven):
    curve, circuit, index, g, h, proofs = proven
    import copy

    bad = copy.deepcopy(proofs[0])
    bad.evals[0][0] = (bad.evals[0][0] + 1) % curve.scalar.p
    assert not prover_host.host_verify(index, bad, g, h)
