"""Chunked polynomial commitments: domains larger than the SRS.

The real Pickles shapes are Step 2^18 / Wrap 2^17 over the 2^16-point
SRS (reference README.md:485-486): every opened polynomial splits into
SRS-sized chunks, each an independently-opened row of the one batched
IPA opening, and the verifier recombines chunk openings with powers of
zeta^N for the quotient identity (prover_host.py chunk helpers). These
tests exercise the whole chunked pipeline at toy sizes (n up to 64 over
an 8..32-point SRS prefix) where the host prover runs in seconds.
"""

import copy
import random

import pytest

from mina_bridge_tpu.curves import host as hc
from mina_bridge_tpu.curves.host import PALLAS, VESTA
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.kimchi import bench_fixtures as bf
from mina_bridge_tpu.kimchi import prover_host
from mina_bridge_tpu.kimchi.domain import Domain, ifft, poly_eval


@pytest.fixture(scope="module", params=[(PALLAS, 5, 3), (VESTA, 5, 4)])
def chunked_proof(request):
    curve, log_n, logN = request.param
    fs = curve.scalar
    n_gates = 4
    circuit = bf.build_chain_circuit(fs, log_n, n_gates)
    g, h = srs_points_host(curve.name, 1 << logN)
    index = prover_host.setup(circuit, curve, g, h, srs_len=1 << logN)
    w, pub = bf.chain_witness(fs, circuit, n_gates, 3)
    pr = prover_host.prove(index, circuit, w, pub, g, h, random.Random(99))
    return curve, circuit, index, g, h, pr


def test_chunk_shapes(chunked_proof):
    curve, circuit, index, g, h, pr = chunked_proof
    nc = index.chunks
    assert nc == circuit.n // index.chunk_size and nc > 1
    assert len(pr.evals) == prover_host.N_OPENED * nc
    assert len(pr.t_comm) == prover_host.T_CHUNKS * nc
    # IPA over the SRS, not the domain: log(SRS) folding rounds
    assert len(pr.opening.chals) == (index.chunk_size).bit_length() - 1
    # every per-poly commitment carries nc chunk points
    assert all(len(prover_host.as_chunks(c)) == nc for c in pr.w_comm)


def test_chunked_host_verify(chunked_proof):
    curve, circuit, index, g, h, pr = chunked_proof
    assert prover_host.host_verify(index, pr, g, h)


@pytest.mark.parametrize(
    "tamper",
    ["chunk_eval", "ft_eval1", "chunk_comm", "t_comm", "public"],
)
def test_chunked_tampers_rejected(chunked_proof, tamper):
    curve, circuit, index, g, h, pr = chunked_proof
    ps = curve.scalar.p
    bad = copy.deepcopy(pr)
    if tamper == "chunk_eval":
        # a high-chunk opening of w_0 (a row that only exists chunked)
        bad.evals[1][0] = (bad.evals[1][0] + 1) % ps
    elif tamper == "ft_eval1":
        bad.ft_eval1 = (bad.ft_eval1 + 1) % ps
    elif tamper == "chunk_comm":
        pt = bad.w_comm[0][1]
        bad.w_comm[0][1] = hc.add(curve, pt, pt)
    elif tamper == "t_comm":
        pt = bad.t_comm[-1]
        bad.t_comm[-1] = hc.add(curve, pt, pt)
    elif tamper == "public":
        bad.public[0] = (bad.public[0] + 1) % ps
    assert not prover_host.host_verify(index, bad, g, h)


def test_lagrange_chunk_eval_closed_form():
    """The closed form used by the verifier equals the direct chunk
    evaluation of the interpolated Lagrange basis polynomial."""
    fs = PALLAS.scalar
    dom = Domain(fs, 5)
    n, N = dom.n, 8
    nc = n // N
    rng = random.Random(5)
    for i in (0, 1, 7):
        unit = [0] * n
        unit[i] = 1
        li = ifft(dom, unit)
        y = rng.randrange(fs.p)
        for j in range(nc):
            direct = poly_eval(li[j * N : (j + 1) * N], y, fs.p)
            closed = prover_host.lagrange_chunk_eval(dom, i, j, N, y)
            assert direct == closed, (i, j)


def test_chunked_device_verify(chunked_proof):
    """The DEVICE verifier accepts chunked proofs (batched, one MSM) and
    rejects a tampered chunk opening — exercising the chunk-combine,
    chunked transcript, chunked virtual rows and the chunked public
    hint path end-to-end at toy size."""
    import dataclasses

    import jax.numpy as jnp

    from mina_bridge_tpu.kimchi import verifier as kv
    from tests.test_kimchi_device import rand_weights

    curve, circuit, index, g, h, pr = chunked_proof
    dindex = kv.DeviceVerifierIndex.from_host(index, g, h)
    assert dindex.nc == index.chunks > 1
    dproofs = kv.DeviceProofs.from_host([pr, pr])
    rw = rand_weights(curve, 2)
    assert bool(kv.verify(dindex, dproofs, rw))

    # hinted public-commitment path (the serving-path fast lane)
    hint = kv.host_public_commitments(dindex, [pr.public, pr.public])
    assert bool(kv.verify(dindex, dproofs, rw, pub_comm_hint=hint))

    # tampered high-chunk opening of w_0 must be rejected
    bad = dataclasses.replace(
        dproofs, evals=dproofs.evals.at[0, 1, 0, 0].add(1)
    )
    assert not bool(kv.verify(dindex, bad, rw))
    # tampered high chunk of a witness commitment must be rejected
    bad2 = dataclasses.replace(
        dproofs, w_comm=dproofs.w_comm.at[1, 1, 0, 0].add(1)
    )
    assert not bool(kv.verify(dindex, bad2, rw))


def test_combine_chunk_evals_identity():
    """Combined chunk openings equal the full-polynomial evaluations."""
    fs = PALLAS.scalar
    rng = random.Random(11)
    n, N = 32, 8
    nc = n // N
    coeffs = [rng.randrange(fs.p) for _ in range(n)]
    zeta, zeta_w = rng.randrange(fs.p), rng.randrange(fs.p)
    flat = [
        [
            poly_eval(coeffs[j * N : (j + 1) * N], zeta, fs.p),
            poly_eval(coeffs[j * N : (j + 1) * N], zeta_w, fs.p),
        ]
        for j in range(nc)
    ]
    [(e0, e1)] = prover_host.combine_chunk_evals(
        flat, nc, zeta, zeta_w, N, fs.p
    )
    assert e0 == poly_eval(coeffs, zeta, fs.p)
    assert e1 == poly_eval(coeffs, zeta_w, fs.p)
