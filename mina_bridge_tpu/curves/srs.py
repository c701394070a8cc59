"""SRS (structured reference string) loading for the IPA commitment scheme.

Parses the rmp-serde (MessagePack) `.srs` files shipped with the reference
(srs/pallas.srs, srs/vesta.srs — public common-reference-string data,
2^16 compressed 33-byte points + one blinding point `h`), decompresses the
points on the host (Tonelli-Shanks square roots) and caches the result as
limb arrays so the expensive decompression runs once per machine.

Layout (verified against the shipped files):
  0x92                    fixarray(2)         -> (g, h)
  0xdd <u32 n>            array32, n = 65536  -> g
  n x (0xc4 0x21 <33B>)   bin8(33) per point
  0xc4 0x21 <33B>         h
"""

from __future__ import annotations

import functools
import os
import pathlib

import numpy as np

from ..fields.params import NLIMBS, int_to_limbs
from . import host as hc
from .host import PALLAS, VESTA, CurveSpec

_SRS_DIR = pathlib.Path(__file__).resolve().parents[2] / "srs"
_CACHE_DIR = pathlib.Path(
    os.environ.get("MINA_BRIDGE_TPU_CACHE", "/tmp/mina_bridge_tpu_cache")
)

SRS_SIZE = 1 << 16


def _parse_msgpack_srs(data: bytes) -> tuple[list[bytes], bytes]:
    if data[0] != 0x92:
        raise ValueError("expected fixarray(2)")
    off = 1
    if data[off] != 0xDD:
        raise ValueError("expected array32 for g")
    n = int.from_bytes(data[off + 1 : off + 5], "big")
    off += 5
    g = []
    for _ in range(n):
        if data[off] != 0xC4 or data[off + 1] != 33:
            raise ValueError("expected bin8(33) point")
        g.append(data[off + 2 : off + 35])
        off += 35
    if data[off] != 0xC4 or data[off + 1] != 33:
        raise ValueError("expected bin8(33) h point")
    h = data[off + 2 : off + 35]
    return g, h


def _decompress_all(c: CurveSpec, raw: list[bytes]) -> np.ndarray:
    """-> (n, 2) object-free packed x/y as (n, 2, NLIMBS) int32 limbs."""
    out = np.zeros((len(raw), 2, NLIMBS), dtype=np.int32)
    for i, b in enumerate(raw):
        pt = hc.decompress(c, b)
        assert pt is not None, "SRS contains the identity?"
        out[i, 0] = int_to_limbs(pt[0], NLIMBS)
        out[i, 1] = int_to_limbs(pt[1], NLIMBS)
    return out


@functools.cache
def load_srs(curve_name: str, size: int = SRS_SIZE) -> dict:
    """Load (and cache) the SRS for 'pallas' or 'vesta'.

    Returns {'g': (size, 2, NLIMBS) int32 affine limbs, 'h': (2, NLIMBS)}.
    Only the first `size` points are decompressed on a cold cache: the
    Tonelli-Shanks host decompression of the full 2^16-point table costs
    the better part of a minute, which must not be paid by small-domain
    cold starts (fixtures, the driver's multichip dryrun). A larger
    cached table is sliced instead of re-decompressing.
    """
    c = {"pallas": PALLAS, "vesta": VESTA}[curve_name]
    for cached_size in sorted(
        {size, SRS_SIZE} | _cached_sizes(curve_name)
    ):
        if cached_size < size:
            continue
        cache = _CACHE_DIR / f"srs_{curve_name}_{cached_size}.npz"
        if cache.exists():
            z = np.load(cache)
            return {"g": z["g"][:size], "h": z["h"], "curve": c}

    data = (_SRS_DIR / f"{curve_name}.srs").read_bytes()
    raw_g, raw_h = _parse_msgpack_srs(data)
    if size > len(raw_g):
        raise ValueError(f"SRS has only {len(raw_g)} points")
    g = _decompress_all(c, raw_g[:size])
    h = _decompress_all(c, [raw_h])[0]
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(_CACHE_DIR / f"srs_{curve_name}_{size}.npz", g=g, h=h)
    return {"g": g, "h": h, "curve": c}


def _cached_sizes(curve_name: str) -> set[int]:
    try:
        return {
            int(p.stem.rsplit("_", 1)[1])
            for p in _CACHE_DIR.glob(f"srs_{curve_name}_*.npz")
        }
    except (ValueError, OSError):
        return set()


def srs_points_host(curve_name: str, size: int) -> tuple[list, tuple]:
    """Host affine tuples for fixture generation."""
    from ..fields.params import limbs_to_int

    srs = load_srs(curve_name, SRS_SIZE)
    g = [
        (limbs_to_int(srs["g"][i, 0]), limbs_to_int(srs["g"][i, 1]))
        for i in range(size)
    ]
    h = (limbs_to_int(srs["h"][0]), limbs_to_int(srs["h"][1]))
    return g, h
