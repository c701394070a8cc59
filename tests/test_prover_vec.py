"""Vectorized quotient path (kimchi/prover_vec) vs the per-row oracle.

The native vector pipeline must reproduce the Python per-row quotient
bit-exactly: same rng => byte-identical proof docs.
"""

import random

import pytest

from mina_bridge_tpu import native
from mina_bridge_tpu.kimchi import bench_fixtures as bf
from mina_bridge_tpu.kimchi import prover_host

from test_kimchi_host import build_example


pytestmark = pytest.mark.skipif(
    not native.vec_available(), reason="native vector ops unavailable"
)


def _prove_both(index, circuit, w, pub, g, h, seed):
    p_vec = prover_host.prove(
        index, circuit, w, pub, g, h, random.Random(seed)
    )
    orig = native.vec_available
    native.vec_available = lambda: False
    try:
        p_py = prover_host.prove(
            index, circuit, w, pub, g, h, random.Random(seed)
        )
    finally:
        native.vec_available = orig
    return bf._proof_doc(p_vec), bf._proof_doc(p_py)


def test_quotient_vec_matches_py_simple():
    from mina_bridge_tpu.curves.srs import srs_points_host

    curve, circuit, witness_for = build_example()
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, curve, g, h)
    w, pub = witness_for(5, 7)
    d_vec, d_py = _prove_both(index, circuit, w, pub, g, h, seed=11)
    assert d_vec == d_py


def test_quotient_vec_matches_py_gate_rich():
    """A transcript-replay-style circuit carries poseidon permutation
    spans, generic add/const rows and endomulscalar crumb chains (the
    wrap circuit's gadget set) — nonzero selectors exercise the
    vectorized gate constraint evaluators beyond the mul/add pair."""
    from mina_bridge_tpu.curves import PALLAS
    from mina_bridge_tpu.curves.srs import srs_points_host
    from mina_bridge_tpu.kimchi.circuit import CircuitBuilder
    from mina_bridge_tpu.pickles import verifier as pv

    b = CircuitBuilder(PALLAS.scalar, 7)
    b.public_input()
    tg = pv._transcript_gadget(b, ["absorb"] * 4 + ["squeeze"])
    pg = pv._prechal_gadget(b, tg["squeeze"][0])
    circuit = b.build()
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    w = [[0] * circuit.n for _ in range(15)]
    [sq] = pv._transcript_fill(w, tg, [1, 2, 3, 4], PALLAS.scalar)
    pv._prechal_fill(w, pg, sq, PALLAS.scalar.p)
    public = [55]
    w[0][0] = 55
    d_vec, d_py = _prove_both(index, circuit, w, public, g, h, seed=5)
    assert d_vec == d_py
