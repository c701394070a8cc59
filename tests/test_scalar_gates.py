"""EC scalar gates: varbasemul, endomul, endomulscalar (host semantics +
host prove/verify). Gate expressions: kimchi/gates.py; fillers:
kimchi/gadgets.py; oracle: curves/host.py."""

import random

import pytest

from mina_bridge_tpu.commitment.ipa import endo_to_field
from mina_bridge_tpu.curves import PALLAS, VESTA, host as hc
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.kimchi import gadgets as gd, prover_host
from mina_bridge_tpu.kimchi.circuit import COLUMNS, CircuitBuilder

FS = PALLAS.scalar  # circuit field Fq
E = VESTA  # embedded curve: coordinates in Fq

VB_BITS = 10
EM_BITS = 8
ES_BITS = 16


def build_circuit():
    """Canonical 16-row circuit: 1 public + all three scalar gadgets."""
    b = CircuitBuilder(FS, 4)
    pub = b.public_input()
    vb = gd.scalar_mul_gadget(b, VB_BITS)  # 4 rows
    em = gd.endo_mul_gadget(b, EM_BITS)  # 3 rows
    es = gd.endo_scalar_gadget(b, ES_BITS)  # 1 row
    b.connect([vb["n_out"], pub])  # bind the vbmul scalar to the public
    return b.build(), pub, vb, em, es


@pytest.fixture(scope="module")
def world():
    rng = random.Random(0xE5CA1A)
    circuit, pub, vb, em, es = build_circuit()
    n = circuit.n
    w = [[0] * n for _ in range(COLUMNS)]

    T = hc.mul(E, rng.randrange(2, 1 << 64), E.generator)
    vb_bits = [rng.randrange(2) for _ in range(VB_BITS)]
    em_t = rng.randrange(1 << EM_BITS)
    em_bits = [(em_t >> (EM_BITS - 1 - i)) & 1 for i in range(EM_BITS)]
    es_t = rng.randrange(1 << ES_BITS)

    # start from 2T (kimchi convention: the chord through T and +-T is
    # degenerate, so the chain starts at the doubled point)
    vb_acc, vb_n = gd.scalar_mul_fill(E, w, vb, T, vb_bits, acc0=hc.mul(E, 2, T))
    em_acc, em_n = gd.endo_mul_fill(E, w, em, T, em_bits)
    es_n, es_a, es_b = gd.endo_scalar_fill(FS.p, w, es, es_t)
    w[0][0] = vb_n  # public input
    return (
        circuit, w, [vb_n],
        dict(T=T, vb_bits=vb_bits, vb_acc=vb_acc, vb_n=vb_n,
             em_t=em_t, em_acc=em_acc, em_n=em_n,
             es_t=es_t, es_n=es_n, es_a=es_a, es_b=es_b),
    )


def test_witness_satisfies_constraints(world):
    circuit, w, public, _ = world
    circuit.check_witness(w, public)


def test_varbasemul_semantics(world):
    _, _, _, d = world
    # Acc_final = 2^k * Acc0 + m*T with Acc0 = 2T, m = signed bit sum
    m = sum(
        (2 * b - 1) << (VB_BITS - 1 - i) for i, b in enumerate(d["vb_bits"])
    )
    scal = ((1 << (VB_BITS + 1)) + m) % E.scalar.p
    assert d["vb_acc"] == hc.mul(E, scal, d["T"])
    assert d["vb_n"] == sum(
        b << (VB_BITS - 1 - i) for i, b in enumerate(d["vb_bits"])
    )


def test_endomul_semantics(world):
    _, _, _, d = world
    want = endo_to_field(d["em_t"], E.endo_scalar, E.scalar.p, nbits=EM_BITS)
    assert d["em_acc"] == hc.mul(E, want, d["T"])
    assert d["em_n"] == d["em_t"]


def test_endomulscalar_semantics(world):
    _, _, _, d = world
    assert d["es_n"] == d["es_t"]
    # a, b are tiny integers; the recombination holds in the embedded
    # curve's scalar field (Pickles defers it there)
    want = endo_to_field(d["es_t"], E.endo_scalar, E.scalar.p, nbits=ES_BITS)
    got = (d["es_a"] * E.endo_scalar + d["es_b"]) % E.scalar.p
    assert got == want


def test_endomul_matches_endomulscalar_decomposition(world):
    """The two gates agree: [a*lambda + b]T == endomul chain output."""
    _, _, _, d = world
    t = d["em_t"]
    f = endo_to_field(t, E.endo_scalar, E.scalar.p, nbits=EM_BITS)
    assert hc.mul(E, f, d["T"]) == d["em_acc"]


def test_corrupted_witness_rejected(world):
    circuit, w, public, _ = world
    for col, row in [(9, None), (11, None)]:  # a slope and an n' cell
        bad = [c[:] for c in w]
        # find a row where this column is used by a custom gate
        target = next(
            r for r in range(circuit.n)
            if any(circuit.sel[g][r] for g in ("varbasemul", "endomul"))
        )
        bad[col][target] = (bad[col][target] + 1) % FS.p
        with pytest.raises(AssertionError):
            circuit.check_witness(bad, public)


def test_prove_and_verify_with_scalar_gates(world):
    circuit, w, public, _ = world
    rng = random.Random(7)
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proof = prover_host.prove(index, circuit, w, public, g, h, rng)
    assert prover_host.host_verify(index, proof, g, h)
    import dataclasses

    bad = dataclasses.replace(proof, public=[(public[0] + 1) % FS.p])
    assert not prover_host.host_verify(index, bad, g, h)
