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


_KEY_VERSION = "v2"  # bump to orphan every pre-fix cache entry


def _cpu_fingerprint() -> str:
    bits: list[str] = [_KEY_VERSION, platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        bits.append(platform.processor() or "unknown")
    # The cpuinfo flags alone are NOT sufficient: XLA's CPU target
    # machine-feature set also carries jaxlib/XLA-synthesized
    # pseudo-features (+prefer-no-scatter/+prefer-no-gather, seen in the
    # round-4 stale-hit SIGILL warning) that depend on the installed
    # jaxlib and on XLA_FLAGS — fold both into the key so a version or
    # flag change is a clean miss instead of a miscompiled hit.
    try:
        from importlib.metadata import version

        bits.append("jaxlib=" + version("jaxlib"))
    except Exception:
        bits.append("jaxlib=unknown")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    bits.append(" ".join(sorted(xla_flags.split())))
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(base: str = "/tmp/mina_bridge_tpu_jax_cache") -> str:
    """Per-machine persistent cache dir (created if missing)."""
    d = f"{base}-{_cpu_fingerprint()}"
    os.makedirs(d, exist_ok=True)
    return d
