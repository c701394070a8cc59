"""Merge proof documents into a committed kimchi fixture.

Usage: python scripts/merge_fixture.py <base.json.gz> <extra.json.gz> <out.json.gz> <batch>

Takes the committed base fixture (index + proofs) and an extras file
produced by scripts/gen_more_proofs.py (same index, more proofs),
asserts index equality, concatenates proofs, truncates/validates to
`batch` DISTINCT proofs, and writes the merged fixture. Every proof is
host-verified against the index before the write — a corrupted
generation run must never land in `fixtures/`.
"""

import gzip
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    base, extra, out, batch = (
        pathlib.Path(sys.argv[1]),
        pathlib.Path(sys.argv[2]),
        pathlib.Path(sys.argv[3]),
        int(sys.argv[4]),
    )
    with gzip.open(base, "rt") as f:
        bdoc = json.load(f)
    with gzip.open(extra, "rt") as f:
        edoc = json.load(f)
    assert bdoc["index"] == edoc["index"], "index mismatch between files"
    proofs = bdoc["proofs"] + edoc["proofs"]
    assert len(proofs) >= batch, f"only {len(proofs)} proofs, need {batch}"
    proofs = proofs[:batch]
    pubs = [tuple(p["public"]) for p in proofs]
    assert len(set(pubs)) == batch, "proofs are not distinct"

    # host-verify every proof against the real SRS before committing
    from mina_bridge_tpu.curves.srs import srs_points_host
    from mina_bridge_tpu.kimchi import bench_fixtures as bf
    from mina_bridge_tpu.kimchi import prover_host

    index = bf._index_from_doc(bdoc["index"], bf.PALLAS)
    g, h = srs_points_host("pallas", index.chunk_size)
    for i, pd in enumerate(proofs):
        pr = bf._proof_from_doc(pd)
        assert prover_host.host_verify(index, pr, g, h), f"proof {i} invalid"
        print(f"proof {i} host-verified", flush=True)

    with gzip.open(out, "wt") as f:
        json.dump({"index": bdoc["index"], "proofs": proofs}, f)
    print(f"wrote {out} with {batch} proofs")


if __name__ == "__main__":
    main()
