"""Real-scale kimchi proof fixtures for the verifier benchmark.

The reference verifies Pickles proofs at Step 2^18 / Wrap 2^17 domains
over a 2^16-point SRS (reference README.md:479-486); round-1 artifacts
only ever exercised toy n=16 domains. This module builds an SRS-sized
(2^16-row) circuit — a long multiplicative chain x -> x^(2^m) with the
result bound to a public input — proves it with the host prover, and
serializes exactly the pieces the device verifier needs (index
commitments + proofs, ~30 KB JSON) so the driver's benchmark does not
pay the multi-minute host proving cost on a cold machine.

The verifier's work is domain-bound (one SRS-wide MSM + O(n) scalar
vectors), so this is a faithful real-scale verification workload.
"""

from __future__ import annotations

import dataclasses
import gzip
import json
import os
import pathlib
import random

from ..commitment import ipa
from ..curves import groupmap as gm
from ..curves.host import CurveSpec, PALLAS
from ..curves.srs import srs_points_host
from . import gates as G
from . import prover_host
from .circuit import COLUMNS, CircuitBuilder
from .domain import Domain
from .prover_host import HostProof, VerifierIndexHost

_REPO_FIXTURES = pathlib.Path(__file__).resolve().parents[2] / "fixtures"
_CACHE_DIR = pathlib.Path(
    os.environ.get("MINA_BRIDGE_TPU_CACHE", "/tmp/mina_bridge_tpu_cache")
)


def build_chain_circuit(field, log_n: int, n_gates: int):
    """x_{i+1} = x_i^2 chain with the final value as the public input."""
    b = CircuitBuilder(field, log_n)
    pub = b.public_input()
    cells = [b.mul_gate() for _ in range(n_gates)]
    for i in range(n_gates):
        a_c, b_c, c_c = cells[i]
        b.connect([a_c, b_c])  # square: both inputs are the same wire
        if i + 1 < n_gates:
            b.connect([c_c, cells[i + 1][0]])
    b.connect([cells[-1][2], pub])
    return b.build()


def chain_witness(field, circuit, n_gates: int, x0: int):
    """Witness for build_chain_circuit: the squaring chain from x0."""
    p = field.p
    w = [[0] * circuit.n for _ in range(COLUMNS)]
    vals = [x0 % p]
    for _ in range(n_gates):
        vals.append(vals[-1] * vals[-1] % p)
    out = vals[-1]
    w[0][0] = out  # public row
    for i in range(n_gates):
        row = 1 + i
        w[0][row] = vals[i]
        w[1][row] = vals[i]
        w[2][row] = vals[i + 1]
    return w, [out]


def make_fixture(log_n: int, batch: int, n_gates: int | None = None):
    """Prove `batch` chain circuits at domain 2^log_n (host; minutes)."""
    curve = PALLAS
    fs = curve.scalar
    n = 1 << log_n
    if n_gates is None:
        n_gates = max(1, min(n - 16, n // 2))
    circuit = build_chain_circuit(fs, log_n, n_gates)
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, curve, g, h)
    rng = random.Random(20260820)
    proofs = []
    for i in range(batch):
        w, pub = chain_witness(fs, circuit, n_gates, 3 + i)
        proofs.append(prover_host.prove(index, circuit, w, pub, g, h, rng))
    return index, proofs


# ---------------------------------------------------------------------------
# Serialization (hex-int JSON; only what DeviceVerifierIndex needs)
# ---------------------------------------------------------------------------

def _pt(p):
    # a chunked commitment (list of points) nests: [[hex,hex], ...] —
    # distinguishable from a bare point [hex, hex] by element type
    if isinstance(p, list):
        return [_pt(q) for q in p]
    return None if p is None else [hex(p[0]), hex(p[1])]


def _unpt(v):
    if v is None:
        return None
    if isinstance(v[0], str):  # a bare point [hex_x, hex_y]
        return (int(v[0], 16), int(v[1], 16))
    # a chunk list: elements are points or None (an all-identity chunked
    # commitment, e.g. an unused selector, is [None, ..., None])
    return [_unpt(q) for q in v]


def _index_doc(index: VerifierIndexHost) -> dict:
    doc = {
        "log_n": index.domain.log_size,
        "npub": index.npub,
        "shifts": [hex(s) for s in index.shifts],
        "sigma_comm": [_pt(p) for p in index.sigma_comm],
        "coeff_comm": [_pt(p) for p in index.coeff_comm],
        "sel_comm": {k: _pt(p) for k, p in index.sel_comm.items()},
        "table_comm": [_pt(p) for p in index.table_comm],
        "qlk_comm": _pt(index.qlk_comm),
    }
    if index.srs_len:  # chunked index; key absent in pre-chunk fixtures
        doc["srs_len"] = index.srs_len
    return doc


def _proof_doc(pr: HostProof) -> dict:
    op = pr.opening
    doc = {}
    if pr.prev_challenges:  # carried pickles accumulators (wrap proofs)
        doc["prev"] = [
            [[hex(c) for c in chals], _pt(sg)]
            for chals, sg in pr.prev_challenges
        ]
    return doc | {
        "w_comm": [_pt(p) for p in pr.w_comm],
        "z_comm": _pt(pr.z_comm),
        "s_comm": [_pt(p) for p in pr.s_comm],
        "rt_comm": _pt(pr.rt_comm),
        "zl_comm": _pt(pr.zl_comm),
        "t_comm": [_pt(p) for p in pr.t_comm],
        "evals": [[hex(e0), hex(e1)] for e0, e1 in pr.evals],
        "ft_eval1": hex(pr.ft_eval1),
        "public": [hex(x) for x in pr.public],
        "lr": [[_pt(L), _pt(R)] for L, R in op.lr],
        "delta": _pt(op.delta),
        "z1": hex(op.z1),
        "z2": hex(op.z2),
        "sg": _pt(op.sg),
        "chals": [hex(x) for x in op.chals],
        "u_hints": {
            "sel": op.u_hints.sel,
            "y": hex(op.u_hints.y),
            "wits": [hex(w) for w in op.u_hints.wits],
            "alpha": hex(op.u_hints.alpha),
        },
    }


def save_fixture(path: pathlib.Path, index, proofs) -> None:
    doc = {
        "index": _index_doc(index),
        "proofs": [_proof_doc(p) for p in proofs],
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump(doc, f)


def _index_from_doc(d: dict, curve: CurveSpec) -> VerifierIndexHost:
    return VerifierIndexHost(
        curve=curve,
        domain=Domain(curve.scalar, d["log_n"]),
        npub=d["npub"],
        sigma_comm=[_unpt(p) for p in d["sigma_comm"]],
        coeff_comm=[_unpt(p) for p in d["coeff_comm"]],
        sel_comm={k: _unpt(p) for k, p in d["sel_comm"].items()},
        table_comm=[_unpt(p) for p in d["table_comm"]],
        qlk_comm=_unpt(d["qlk_comm"]),
        shifts=tuple(int(s, 16) for s in d["shifts"]),
        srs_len=d.get("srs_len"),
        # coefficient polynomials are prover-side only; the device
        # verifier index never reads them (kimchi/verifier.py from_host)
        sigma_coeffs=None,
        coeff_coeffs=None,
        sel_coeffs=None,
        table_coeffs=None,
        qlk_coeffs=None,
        rt_rows=None,
    )


def _proof_from_doc(pd: dict) -> HostProof:
    uh = pd["u_hints"]
    opening = ipa.HostOpeningProof(
        lr=[(_unpt(L), _unpt(R)) for L, R in pd["lr"]],
        delta=_unpt(pd["delta"]),
        z1=int(pd["z1"], 16),
        z2=int(pd["z2"], 16),
        sg=_unpt(pd["sg"]),
        chals=[int(x, 16) for x in pd["chals"]],
        u_hints=gm.UHints(
            sel=uh["sel"],
            y=int(uh["y"], 16),
            wits=tuple(int(w, 16) for w in uh["wits"]),
            alpha=int(uh["alpha"], 16),
        ),
    )
    return HostProof(
        w_comm=[_unpt(p) for p in pd["w_comm"]],
        z_comm=_unpt(pd["z_comm"]),
        s_comm=[_unpt(p) for p in pd["s_comm"]],
        rt_comm=_unpt(pd["rt_comm"]),
        zl_comm=_unpt(pd["zl_comm"]),
        t_comm=[_unpt(p) for p in pd["t_comm"]],
        evals=[(int(e0, 16), int(e1, 16)) for e0, e1 in pd["evals"]],
        ft_eval1=int(pd["ft_eval1"], 16),
        opening=opening,
        public=[int(x, 16) for x in pd["public"]],
        prev_challenges=[
            ([int(c, 16) for c in chals], _unpt(sg))
            for chals, sg in pd.get("prev", [])
        ],
    )


def load_fixture(path: pathlib.Path, curve: CurveSpec = PALLAS):
    with gzip.open(path, "rt") as f:
        doc = json.load(f)
    index = _index_from_doc(doc["index"], curve)
    proofs = [_proof_from_doc(pd) for pd in doc["proofs"]]
    return index, proofs


def fixture_path(log_n: int, batch: int) -> pathlib.Path:
    return _REPO_FIXTURES / f"kimchi_2e{log_n}_b{batch}.json.gz"


def get_fixture(log_n: int = 16, batch: int = 2):
    """Load the repo fixture, else the machine cache, else generate."""
    for base in (fixture_path(log_n, batch),
                 _CACHE_DIR / f"kimchi_2e{log_n}_b{batch}.json.gz"):
        if base.exists():
            return load_fixture(base)
    index, proofs = make_fixture(log_n, batch)
    save_fixture(_CACHE_DIR / f"kimchi_2e{log_n}_b{batch}.json.gz",
                 index, proofs)
    return index, proofs
