"""Machine-fingerprinted JAX persistent-compile-cache location.

XLA:CPU AOT executables are compiled against the *build host's* CPU
feature set. JAX's file cache key does NOT include those features, so a
cache directory carried across machines (shared /tmp images, driver
boxes rotating between hosts) gets silently loaded on a host with a
different ISA — XLA logs "could lead to execution errors such as SIGILL"
and can compute garbage (observed: a cached jit_verify from an
avx512/amx host mis-verifying on a plain-avx host). Fingerprinting the
directory name with the host's CPU feature flags makes a machine change
a clean cache miss instead of a miscompiled hit.

Import-safe before jax (no jax imports here).
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_fingerprint() -> str:
    bits: list[str] = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        bits.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(base: str = "/tmp/mina_bridge_tpu_jax_cache") -> str:
    """Per-machine persistent cache dir (created if missing)."""
    d = f"{base}-{_cpu_fingerprint()}"
    os.makedirs(d, exist_ok=True)
    return d
