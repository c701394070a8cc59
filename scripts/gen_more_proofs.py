"""Extend the committed kimchi 2^16 fixture with more distinct proofs.

Usage: python scripts/gen_more_proofs.py <log_n> <x0_start> <count> <out.json.gz>

Rebuilds the deterministic chain circuit + index (asserted identical to
the committed fixture's index), proves `count` witnesses with
x0 = x0_start .. x0_start+count-1, and writes ONLY the new proof docs
(merged later by scripts/merge_fixture.py). Each proof gets its own rng
seed so runs are order-independent; blinding randomness does not need to
match any previous run — proofs only need to verify.
"""

import gzip
import json
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mina_bridge_tpu.kimchi import bench_fixtures as bf
from mina_bridge_tpu.kimchi import prover_host
from mina_bridge_tpu.curves.host import PALLAS
from mina_bridge_tpu.curves.srs import srs_points_host


def main():
    log_n, x0_start, count = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out = pathlib.Path(sys.argv[4])
    n = 1 << log_n
    n_gates = max(1, min(n - 16, n // 2))
    t0 = time.time()
    fs = PALLAS.scalar
    circuit = bf.build_chain_circuit(fs, log_n, n_gates)
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, PALLAS, g, h)
    print(f"setup done in {time.time()-t0:.1f}s", flush=True)

    # the index must match the committed fixture's (same deterministic
    # circuit); guard against drift before burning hours of proving
    ref = bf.fixture_path(log_n, 8)
    if ref.exists():
        with gzip.open(ref, "rt") as f:
            ref_index = json.load(f)["index"]
        assert bf._index_doc(index) == ref_index, "index drift vs committed fixture"
        print("index matches committed b8 fixture", flush=True)

    docs = []
    for i in range(count):
        x0 = x0_start + i
        t1 = time.time()
        w, pub = bf.chain_witness(fs, circuit, n_gates, x0)
        pr = prover_host.prove(
            index, circuit, w, pub, g, h, random.Random(20260820 * 1000 + x0)
        )
        docs.append(bf._proof_doc(pr))
        print(f"proof x0={x0} done in {time.time()-t1:.1f}s", flush=True)
        # checkpoint after every proof so a crash loses at most one
        tmp = out.with_suffix(".tmp")
        with gzip.open(tmp, "wt") as f:
            json.dump({"index": bf._index_doc(index), "proofs": docs}, f)
        tmp.rename(out)
    print(f"all done in {time.time()-t0:.1f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
