"""Native (C++) host-runtime components with ctypes bindings.

The reference's runtime is native Rust (SURVEY §2a); here the host-side
hot loops that are NOT TPU compute — batch-commitment hashing, Merkle
tree building — get a C++ implementation (`src/keccak.cpp`), built on
first use with the system toolchain and loaded via ctypes. Pure-Python
implementations (bridge/keccak.py) remain the portable fallback and the
correctness oracle; callers use `native.keccak256` which dispatches.

Set MINA_BRIDGE_TPU_NO_NATIVE=1 to force the Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

_DIR = pathlib.Path(__file__).parent
_SRCS = sorted((_DIR / "src").glob("*.cpp"))
_LIB_DIR = pathlib.Path(
    os.environ.get("MINA_BRIDGE_TPU_NATIVE_DIR", str(_DIR / "lib"))
)
_LIB = _LIB_DIR / "libmbtpu_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    for cxx in ("g++", "clang++", "c++"):
        try:
            _LIB_DIR.mkdir(parents=True, exist_ok=True)
            tmp = _LIB.with_suffix(".so.tmp")
            subprocess.run(
                [cxx, "-O3", "-shared", "-fPIC", "-o", str(tmp)]
                + [str(s) for s in _SRCS],
                check=True,
                capture_output=True,
                timeout=300,
            )
            os.replace(tmp, _LIB)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


def _stale() -> bool:
    if not _LIB.exists():
        return True
    mt = _LIB.stat().st_mtime
    return any(s.stat().st_mtime > mt for s in _SRCS)


def _load():
    """The native library handle, building it if needed; None = fallback."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MINA_BRIDGE_TPU_NO_NATIVE"):
            return None
        if _stale() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        lib.mbtpu_keccak256.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.mbtpu_keccak256_batch.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        lib.mbtpu_merkle_levels.argtypes = [
            ctypes.c_char_p,
            ctypes.c_uint64,
            ctypes.c_char_p,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (Ethereum padding): native if available, else Python."""
    lib = _load()
    if lib is None:
        from ..bridge.keccak import keccak256_py as py_keccak256

        return py_keccak256(data)
    out = ctypes.create_string_buffer(32)
    lib.mbtpu_keccak256(data, len(data), out)
    return out.raw


def keccak256_batch(items: list[bytes]) -> list[bytes]:
    """Hash many byte strings in one native call."""
    lib = _load()
    if lib is None:
        from ..bridge.keccak import keccak256_py as py_keccak256

        return [py_keccak256(x) for x in items]
    blob = b"".join(items)
    offs = (ctypes.c_uint64 * (len(items) + 1))()
    acc = 0
    for i, x in enumerate(items):
        offs[i] = acc
        acc += len(x)
    offs[len(items)] = acc
    out = ctypes.create_string_buffer(32 * len(items))
    lib.mbtpu_keccak256_batch(blob, offs, len(items), out)
    return [out.raw[32 * i : 32 * (i + 1)] for i in range(len(items))]


def merkle_levels(leaves: list[bytes]) -> list[list[bytes]]:
    """All levels of the keccak batch-Merkle tree above `leaves`
    (n a power of two): [level n/2, ..., [root]]."""
    n = len(leaves)
    assert n and (n & (n - 1)) == 0, "power-of-two leaf count"
    if n == 1:
        return []
    lib = _load()
    if lib is None:
        from ..bridge.keccak import keccak256_py as py_keccak256

        levels = []
        level = leaves
        while len(level) > 1:
            level = [
                py_keccak256(level[i] + level[i + 1])
                for i in range(0, len(level), 2)
            ]
            levels.append(level)
        return levels
    blob = b"".join(leaves)
    out = ctypes.create_string_buffer(32 * (n - 1))
    lib.mbtpu_merkle_levels(blob, n, out)
    levels = []
    cursor, width = 0, n // 2
    while width >= 1:
        levels.append(
            [
                out.raw[32 * (cursor + i) : 32 * (cursor + i + 1)]
                for i in range(width)
            ]
        )
        cursor += width
        width //= 2
    return levels


# ---------------------------------------------------------------------------
# Pasta host-crypto runtime (src/pasta.cpp): Montgomery field core,
# Poseidon permutation, NTT, poly eval, Pippenger MSM. Parity with the
# reference's native Rust host stack (openmina_algebra / mina-poseidon,
# SURVEY.md 2b); Python implementations remain the oracle/fallback.
# ---------------------------------------------------------------------------

import functools


def _pasta_bind(lib) -> None:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.mbtpu_field_mul_batch.argtypes = [u64p] * 3 + [ctypes.c_uint64, u64p]
    lib.mbtpu_field_inv_batch.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.mbtpu_poseidon_permute_batch.argtypes = [
        u64p, u64p, ctypes.c_uint64, u64p, u64p, ctypes.c_uint64,
    ]
    lib.mbtpu_ntt.argtypes = [u64p, u64p, ctypes.c_uint64, u64p]
    lib.mbtpu_scale_geometric.argtypes = [u64p, u64p, ctypes.c_uint64, u64p, u64p]
    lib.mbtpu_poly_eval.argtypes = [
        u64p, u64p, ctypes.c_uint64, u64p, ctypes.c_uint64, u64p,
    ]
    lib.mbtpu_msm.argtypes = [
        u64p, u64p, u64p, ctypes.c_uint64, u64p, u64p,
    ]


def _pasta_lib():
    lib = _load()
    if lib is None:
        return None
    if not getattr(lib, "_pasta_bound", False):
        try:
            _pasta_bind(lib)
        except AttributeError:
            return None  # stale .so built from keccak.cpp only
        lib._pasta_bound = True
    return lib


def _words(v: int, n: int = 4):
    return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(n)]


def _arr(vals) -> "ctypes.Array":
    flat = []
    for v in vals:
        flat.extend(_words(v))
    return (ctypes.c_uint64 * len(flat))(*flat)


def _ints(buf, n) -> list[int]:
    out = []
    for i in range(n):
        acc = 0
        for w in range(4):
            acc |= buf[4 * i + w] << (64 * w)
        out.append(acc)
    return out


@functools.cache
def _ctx(p: int) -> "ctypes.Array":
    r2 = pow(1 << 256, 2, p)
    n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    return (ctypes.c_uint64 * 9)(*(_words(p) + _words(r2) + [n0inv]))


@functools.cache
def _poseidon_tables(ps) -> tuple:
    rc = [c for row in ps.round_constants for c in row]
    mds = [c for row in ps.mds for c in row]
    return _arr(rc), len(ps.round_constants), _arr(mds)


def poseidon_permute(ps, state: list[int]) -> "list[int] | None":
    """Native kimchi Poseidon permutation; None -> caller falls back."""
    lib = _pasta_lib()
    if lib is None:
        return None
    rc, nrounds, mds = _poseidon_tables(ps)
    st = _arr(state)
    lib.mbtpu_poseidon_permute_batch(_ctx(ps.field.p), rc, nrounds, mds, st, 1)
    return _ints(st, 3)


def ntt(p: int, data: list[int], root: int) -> "list[int] | None":
    lib = _pasta_lib()
    if lib is None:
        return None
    buf = _arr(data)
    lib.mbtpu_ntt(_ctx(p), buf, len(data), _arr([root]))
    return _ints(buf, len(data))


def scale_geometric(p: int, data: list[int], s0: int, ratio: int):
    lib = _pasta_lib()
    if lib is None:
        return None
    buf = _arr(data)
    lib.mbtpu_scale_geometric(_ctx(p), buf, len(data), _arr([s0]), _arr([ratio]))
    return _ints(buf, len(data))


def poly_eval(p: int, coeffs: list[int], xs: list[int]) -> "list[int] | None":
    lib = _pasta_lib()
    if lib is None:
        return None
    out = (ctypes.c_uint64 * (4 * len(xs)))()
    lib.mbtpu_poly_eval(_ctx(p), _arr(coeffs), len(coeffs), _arr(xs), len(xs), out)
    return _ints(out, len(xs))


def field_inv_batch(p: int, vals: list[int]) -> "list[int] | None":
    lib = _pasta_lib()
    if lib is None:
        return None
    out = (ctypes.c_uint64 * (4 * len(vals)))()
    lib.mbtpu_field_inv_batch(_ctx(p), _arr(vals), len(vals), out)
    return _ints(out, len(vals))


# ---------------------------------------------------------------------------
# Montgomery-domain vector ops over numpy (n, 4) uint64 word arrays —
# the vectorized-prover hot path (kimchi/prover_vec.py). Zero-copy via
# ndarray.ctypes; values stay in Montgomery form between calls.
# ---------------------------------------------------------------------------

import numpy as _np


def _vec_bind(lib) -> None:
    u64p = ctypes.POINTER(ctypes.c_uint64)
    n = ctypes.c_uint64
    lib.mbtpu_vadd.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vsub.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vadd_s.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vsub_s.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vsub_rs.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vmulm.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vmulm_s.argtypes = [u64p, u64p, u64p, n, u64p]
    lib.mbtpu_vto_mont.argtypes = [u64p, u64p, n, u64p]
    lib.mbtpu_vfrom_mont.argtypes = [u64p, u64p, n, u64p]
    lib.mbtpu_vinvm.argtypes = [u64p, u64p, n, u64p]
    lib.mbtpu_nttm.argtypes = [u64p, u64p, n, u64p]
    lib.mbtpu_scale_geom_m.argtypes = [u64p, u64p, n, u64p, u64p]


def _vec_lib():
    lib = _pasta_lib()
    if lib is None:
        return None
    if not getattr(lib, "_vec_bound", False):
        try:
            _vec_bind(lib)
        except AttributeError:
            return None
        lib._vec_bound = True
    return lib


def vec_available() -> bool:
    return _vec_lib() is not None


def _np64(a: "_np.ndarray"):
    assert a.dtype == _np.uint64 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ints_to_words(vals, p: int) -> "_np.ndarray":
    """list[int] -> (n, 4) uint64 canonical little-endian words."""
    buf = b"".join((v % p).to_bytes(32, "little") for v in vals)
    return _np.frombuffer(buf, dtype="<u8").reshape(-1, 4).copy()


def words_to_ints(arr: "_np.ndarray") -> list[int]:
    b = _np.ascontiguousarray(arr, dtype="<u8").tobytes()
    return [
        int.from_bytes(b[32 * i : 32 * (i + 1)], "little")
        for i in range(arr.shape[0])
    ]


def _scalar_words(v: int, p: int) -> "_np.ndarray":
    return ints_to_words([v % p], p).reshape(4)


def _vbinary(name, p, a, b):
    lib = _vec_lib()
    out = _np.empty_like(a)
    getattr(lib, name)(_ctx(p), _np64(a), _np64(b), a.shape[0], _np64(out))
    return out


def vadd(p, a, b):
    return _vbinary("mbtpu_vadd", p, a, b)


def vsub(p, a, b):
    return _vbinary("mbtpu_vsub", p, a, b)


def vmulm(p, a, b):
    return _vbinary("mbtpu_vmulm", p, a, b)


def _vscalar(name, p, a, s):
    lib = _vec_lib()
    out = _np.empty_like(a)
    getattr(lib, name)(_ctx(p), _np64(a), _np64(s), a.shape[0], _np64(out))
    return out


def vadd_s(p, a, s):
    return _vscalar("mbtpu_vadd_s", p, a, s)


def vsub_s(p, a, s):
    return _vscalar("mbtpu_vsub_s", p, a, s)


def vsub_rs(p, a, s):
    """s - a."""
    return _vscalar("mbtpu_vsub_rs", p, a, s)


def vmulm_s(p, a, s):
    return _vscalar("mbtpu_vmulm_s", p, a, s)


def vto_mont(p, a):
    lib = _vec_lib()
    out = _np.empty_like(a)
    lib.mbtpu_vto_mont(_ctx(p), _np64(a), a.shape[0], _np64(out))
    return out


def vfrom_mont(p, a):
    lib = _vec_lib()
    out = _np.empty_like(a)
    lib.mbtpu_vfrom_mont(_ctx(p), _np64(a), a.shape[0], _np64(out))
    return out


def vinvm(p, a):
    lib = _vec_lib()
    out = _np.empty_like(a)
    lib.mbtpu_vinvm(_ctx(p), _np64(a), a.shape[0], _np64(out))
    return out


def vnttm(p, data, root: int):
    """In-place NTT over Montgomery-form (n, 4) data."""
    lib = _vec_lib()
    lib.mbtpu_nttm(_ctx(p), _np64(data), data.shape[0], _np64(_scalar_words(root, p)))
    return data


def vscale_geom_m(p, data, s0: int, ratio: int):
    """In-place data[i] *= s0 * ratio^i (s0/ratio canonical ints)."""
    lib = _vec_lib()
    lib.mbtpu_scale_geom_m(
        _ctx(p), _np64(data), data.shape[0],
        _np64(_scalar_words(s0, p)), _np64(_scalar_words(ratio, p)),
    )
    return data


def msm(base_p: int, points: list, scalars: list[int]):
    """MSM over affine (x, y) int pairs; identity inputs must be filtered
    by the caller. Returns (x, y) or None (identity), or the string
    "fallback" when the native library is unavailable."""
    lib = _pasta_lib()
    if lib is None:
        return "fallback"
    n = len(points)
    if n == 0:
        return None
    pbuf = _arr([c for (x, y) in points for c in (x, y)])
    sbuf = _arr(scalars)
    out = (ctypes.c_uint64 * 8)()
    inf = (ctypes.c_uint64 * 1)()
    lib.mbtpu_msm(_ctx(base_p), pbuf, sbuf, n, out, inf)
    if inf[0]:
        return None
    x, y = _ints(out, 2)
    return (x, y)
