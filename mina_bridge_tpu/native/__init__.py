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
_SRC = _DIR / "src" / "keccak.cpp"
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
                [cxx, "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, _LIB)
            return True
        except (OSError, subprocess.SubprocessError):
            continue
    return False


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
        if not _LIB.exists() and not _build():
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
