"""Kimchi custom gates: poseidon + complete_add circuits, host and device.

The canonical device-verify circuit (16-row domain, npub=1) uses a 1-row
(5-round) poseidon span so everything fits beside the 3 zk rows; the full
55-round permutation is proven host-side on a 32-row domain.
"""

import random

import pytest

from mina_bridge_tpu.curves import PALLAS, VESTA, host as hc
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.fields import host as fh
from mina_bridge_tpu.hash import poseidon
from mina_bridge_tpu.hash.poseidon_params import poseidon_spec
from mina_bridge_tpu.kimchi import gates as G, prover_host
from mina_bridge_tpu.kimchi.circuit import COLUMNS, CircuitBuilder

FS = PALLAS.scalar

POS_ROWS = 1  # poseidon rows in the canonical 16-row circuit (5 rounds)


def build_gate_circuit(log_n=4, pos_rows=POS_ROWS):
    """1 public input + a poseidon span + 1 complete_add row."""
    b = CircuitBuilder(FS, log_n)
    pub = b.public_input()
    pos_in, pos_out, pos_rows_idx = b.poseidon_permutation(pos_rows)
    add_cells = b.complete_add()
    # bind the poseidon output lane 0 to the public input
    b.connect([pos_out[0], pub])
    return b, pub, pos_in, pos_out, pos_rows_idx, add_cells


def fill_witness(b, circuit, pos_rows, add_cells, state0, P, Q):
    ps = poseidon_spec(FS.name)
    p = FS.p
    n = circuit.n
    w = [[0] * n for _ in range(COLUMNS)]

    # poseidon rows: states 5r..5r+4 in w[0..14]; output row gets final
    nrounds = (len(pos_rows) - 1) * G.ROUNDS_PER_ROW
    states = [list(state0)]
    for r in range(nrounds):
        states.append(poseidon.host_permute_round(ps, states[-1], r))
    for ridx, row in enumerate(pos_rows[:-1]):
        for i in range(G.ROUNDS_PER_ROW):
            st = states[5 * ridx + i]
            for j in range(3):
                w[3 * i + j][row] = st[j]
    out_row = pos_rows[-1]
    final = states[-1]
    for j in range(3):
        w[j][out_row] = final[j]

    # public row 0: poseidon output lane 0
    w[0][0] = final[0]

    # complete_add row
    row = add_cells["row"]
    (x1, y1), (x2, y2) = P, Q
    same_x = int(x1 == x2)
    if same_x:
        s = 3 * x1 * x1 * fh.finv(FS, 2 * y1 % p) % p if y1 else 0
        x21_inv = 0
        inf = int((y1 + y2) % p == 0)
        y21 = (y2 - y1) % p
        inf_z = fh.finv(FS, y21) if y21 else 0
    else:
        s = (y2 - y1) * fh.finv(FS, (x2 - x1) % p) % p
        x21_inv = fh.finv(FS, (x2 - x1) % p)
        inf = 0
        inf_z = 0
    x3 = (s * s - x1 - x2) % p
    y3 = (s * (x1 - x3) - y1) % p
    vals = [x1, y1, x2, y2, x3, y3, inf, same_x, s, inf_z, x21_inv]
    for i, v in enumerate(vals):
        w[i][row] = v % p
    return w, [final[0]], (x3, y3, inf)


@pytest.fixture(scope="module")
def gate_world():
    rng = random.Random(0x6A7E)
    b, pub, pos_in, pos_out, pos_rows, add_cells = build_gate_circuit()
    circuit = b.build()
    state0 = [rng.randrange(FS.p) for _ in range(3)]
    # the circuit field FS = Fq is VESTA's base field: the complete_add
    # gate constrains Vesta points (kimchi's step/wrap duality)
    P = hc.mul(VESTA, rng.randrange(2, 1 << 64), VESTA.generator)
    Q = hc.mul(VESTA, rng.randrange(2, 1 << 64), VESTA.generator)
    w, public, out = fill_witness(b, circuit, pos_rows, add_cells, state0, P, Q)
    return rng, circuit, w, public, state0, P, Q, out


def test_gate_witness_satisfies(gate_world):
    rng, circuit, w, public, state0, P, Q, out = gate_world
    circuit.check_witness(w, public)
    # poseidon output matches 5 rounds of the host permutation
    ps = poseidon_spec(FS.name)
    st = list(state0)
    for r in range(POS_ROWS * G.ROUNDS_PER_ROW):
        st = poseidon.host_permute_round(ps, st, r)
    assert public[0] == st[0]
    # complete_add output matches the host curve law
    x3, y3, inf = out
    want = hc.add(VESTA, P, Q)
    assert (want is None) == bool(inf)
    if want is not None:
        assert (x3, y3) == want


def test_gate_witness_rejects_bad(gate_world):
    rng, circuit, w, public, *_ = gate_world
    bad = [col[:] for col in w]
    bad[4][1] = (bad[4][1] + 1) % FS.p  # corrupt a poseidon intermediate
    with pytest.raises(AssertionError):
        circuit.check_witness(bad, public)


def test_full_poseidon_permutation_host():
    """All 55 rounds (11 gate rows) on a 32-row domain, host prove/verify."""
    rng = random.Random(0xF011)
    b, pub, pos_in, pos_out, pos_rows, add_cells = build_gate_circuit(
        log_n=5, pos_rows=None
    )
    circuit = b.build()
    state0 = [rng.randrange(FS.p) for _ in range(3)]
    P = hc.mul(VESTA, 7, VESTA.generator)
    Q = hc.mul(VESTA, 9, VESTA.generator)
    w, public, _ = fill_witness(b, circuit, pos_rows, add_cells, state0, P, Q)
    circuit.check_witness(w, public)
    ps = poseidon_spec(FS.name)
    assert public[0] == poseidon.host_permute(ps, state0)[0]
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proof = prover_host.prove(index, circuit, w, public, g, h, rng)
    assert prover_host.host_verify(index, proof, g, h)


def test_gate_prove_host_verify(gate_world):
    rng, circuit, w, public, *_ = gate_world
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proof = prover_host.prove(index, circuit, w, public, g, h, rng)
    assert prover_host.host_verify(index, proof, g, h)
    import dataclasses

    bad = dataclasses.replace(proof, public=[(public[0] + 1) % FS.p])
    assert not prover_host.host_verify(index, bad, g, h)


def test_gate_device_verify(gate_world):
    rng, circuit, w, public, *_ = gate_world
    import jax.numpy as jnp
    import numpy as np

    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
    from mina_bridge_tpu.kimchi import verifier

    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proofs = [
        prover_host.prove(index, circuit, w, public, g, h, rng)
        for _ in range(2)
    ]
    dindex = verifier.DeviceVerifierIndex.from_host(index, g, h)
    dproofs = verifier.DeviceProofs.from_host(proofs)
    rw = jnp.asarray(
        np.array(
            [
                [
                    int_to_limbs(rng.randrange(FS.p), NLIMBS),
                    int_to_limbs(rng.randrange(FS.p), NLIMBS),
                ]
                for _ in range(2)
            ],
            np.int32,
        )
    )
    assert bool(verifier.verify(dindex, dproofs, rw))
    import dataclasses

    bad = dataclasses.replace(dproofs, evals=dproofs.evals.at[0, 3, 0, 0].add(1))
    assert not bool(verifier.verify(dindex, bad, rw))


def test_lookup_circuit():
    """Plookup: values constrained to a 16-entry range table."""
    import random as _r

    rng = _r.Random(0x100C)
    b = CircuitBuilder(FS, 4)
    pub = b.public_input()
    b.set_lookup_table(list(range(16)))
    c1 = b.lookup_row()
    c2 = b.lookup_row()
    # bind: pub = lookup1 + lookup2 via an add gate
    a_a, a_b, a_c = b.add_gate()
    b.connect([c1, a_a])
    b.connect([c2, a_b])
    b.connect([a_c, pub])
    circuit = b.build()

    n = circuit.n
    w = [[0] * n for _ in range(COLUMNS)]
    v1, v2 = 5, 9
    w[0][c1[1]] = v1
    w[0][c2[1]] = v2
    w[0][a_a[1]], w[1][a_a[1]], w[2][a_a[1]] = v1, v2, v1 + v2
    w[0][0] = v1 + v2
    circuit.check_witness(w, [v1 + v2])

    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proof = prover_host.prove(index, circuit, w, [v1 + v2], g, h, rng)
    assert prover_host.host_verify(index, proof, g, h)

    # out-of-table value: witness check rejects, and the plookup
    # aggregation cannot close
    bad = [col[:] for col in w]
    bad[0][c1[1]] = 99
    bad[0][a_a[1]] = 99
    bad[2][a_a[1]] = 99 + v2
    bad[0][0] = 99 + v2
    with pytest.raises(AssertionError):
        circuit.check_witness(bad, [99 + v2])


def _fill_xor(w, cells, bits, in1, in2):
    out = in1 ^ in2
    r = cells["row"]
    mask = (1 << bits) - 1
    w[0][r], w[1][r], w[2][r] = in1, in2, out
    for q in range(G.LOOKUPS_PER_ROW):
        w[3 + q][r] = (in1 >> (bits * q)) & mask
        w[7 + q][r] = (in2 >> (bits * q)) & mask
        w[11 + q][r] = (out >> (bits * q)) & mask
    return out


def test_kimchi_lookup_patterns():
    """Kimchi-shape lookups: joint xor table, range table, runtime table
    and the legacy single-column table coexisting in one circuit (table
    ids + joint combiner + NSORTED sorted columns)."""
    rng = random.Random(0x100D)
    b = CircuitBuilder(FS, 4)
    b.set_lookup_table([0, 5, 9])
    b.enable_xor(1)
    b.enable_range(1)
    b.set_runtime_table(2)
    lk = b.lookup_row()
    xg = b.xor_gate()
    rg = b.range_gate()
    rt = b.lookup_rt_gate()
    circuit = b.build()
    n = circuit.n

    w = [[0] * n for _ in range(COLUMNS)]
    w[0][lk[1]] = 9
    _fill_xor(w, xg, 1, 0b1010, 0b0110)
    val = 11
    r = rg["row"]
    w[0][r] = val
    for q in range(G.LOOKUPS_PER_ROW):
        w[1 + q][r] = (val >> q) & 1
    rt_data = [100, 200]
    r = rt["row"]
    for q, (i_, v_) in enumerate([(0, 100), (1, 200), (0, 100)]):
        w[1 + 2 * q][r], w[2 + 2 * q][r] = i_, v_
    circuit.check_witness(w, [])

    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    proof = prover_host.prove(
        index, circuit, w, [], g, h, rng, runtime_table=rt_data
    )
    assert prover_host.host_verify(index, proof, g, h)

    # runtime value not in the table: the sorted-multiset walk must fail
    bad = [col[:] for col in w]
    bad[2][rt["row"]] = 101
    with pytest.raises(AssertionError):
        prover_host.prove(
            index, circuit, bad, [], g, h, random.Random(1),
            runtime_table=rt_data,
        )

    # wrong xor output nibble: witness check rejects
    bad2 = [col[:] for col in w]
    bad2[11][xg["row"]] ^= 1
    with pytest.raises(AssertionError):
        circuit.check_witness(bad2, [])
