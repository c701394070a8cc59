"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run anywhere (CI, the single-TPU-chip driver box, dev laptops),
and must exercise the multi-chip sharding paths, so we force the JAX CPU
backend with 8 virtual devices before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random
import sys

# jax's persistent compile cache prefers zstandard, which segfaults
# serializing the multi-hundred-MB verifier executables; force the zlib
# fallback by blocking the import before jax loads.
sys.modules["zstandard"] = None

import jax
import pytest

# The sys.modules block above is NOT enough under pytest: plugin
# autoloading (jaxtyping's pytest plugin imports jax; the pytest import
# chain imports zstandard) runs BEFORE conftest, so jax's
# compilation_cache binds the real zstandard module and the zstd
# serialize segfault returns. Null the binding post-import.
from jax._src import compilation_cache as _cc

_cc.zstandard = None
if getattr(_cc, "zstd", None) is not None:
    _cc.zstd = None

# XLA's CPU LoadedExecutable.serialize() segfaults outright on some of
# the largest verifier executables (it killed whole pytest runs at the
# e2e wrap-verify shape). Run the entire persistent-cache put in a
# forked child: a crash there costs only that cache entry. The child
# only serializes + writes the file-based cache and _exits, so parent
# state is untouched; a kill-timeout guards against fork/lock hangs.
import time as _time
import warnings as _warnings

_orig_put = _cc.put_executable_and_time


def _forked_put(cache_key, module_name, executable, backend, compile_time):
    if os.environ.get("MINA_BRIDGE_TPU_NO_CACHE_PUT"):
        # kill-switch: skip persistent-cache writes entirely (no forks,
        # no serialize) — used to bisect fork/serialize-related crashes
        return
    pid = os.fork()
    if pid == 0:  # child
        try:
            # a crashing serialize is expected for the largest
            # executables: keep its faulthandler dump out of the test log
            import faulthandler

            faulthandler.disable()
            os.dup2(os.open(os.devnull, os.O_WRONLY), 2)
            _orig_put(cache_key, module_name, executable, backend, compile_time)
            os._exit(0)
        except BaseException:
            os._exit(1)
    deadline = _time.time() + 900.0
    while _time.time() < deadline:
        done, status = os.waitpid(pid, os.WNOHANG)
        if done:
            if status != 0:
                _warnings.warn(
                    f"persistent-cache put skipped for '{module_name}' "
                    "(serialize crashed in child)"
                )
            return
        _time.sleep(0.5)
    os.kill(pid, 9)
    os.waitpid(pid, 0)
    _warnings.warn(
        f"persistent-cache put timed out for '{module_name}' (child killed)"
    )


_cc.put_executable_and_time = _forked_put

# The axon sitecustomize registers a TPU plugin at interpreter start and
# pins the platform; env vars alone don't win. Force CPU via config too.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: DISABLED for tests (opt back in with
# MINA_BRIDGE_TPU_TEST_CACHE=1). XLA:CPU executable (de)serialization is
# unreliable for these graphs on this machine class: serialize()
# segfaults on some small graphs (the forked-put guard above), AOT
# results are host-ISA-specific (utils/compile_cache.py fingerprinting),
# and round 3 hit a third failure mode — an entry that WROTE fine but
# SEGFAULTS the whole pytest process on cache READ
# (compilation_cache.get_executable_and_time). A green suite must not
# depend on a cache that can poison it; tests recompile per process.
if os.environ.get("MINA_BRIDGE_TPU_TEST_CACHE"):
    from mina_bridge_tpu.utils.compile_cache import cache_dir as _cache_dir

    jax.config.update("jax_compilation_cache_dir", _cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 20.0)


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


# --- compile budget (VERDICT r4 item 7) -----------------------------------
# The suite's wall time is virtually all XLA:CPU compiles of toy-shape
# verify graphs, and with the persistent cache unusable under pytest
# (above) the SAME canonical shapes (wrap 2^10 / step 2^4 / B=2 — shared
# by test_pickles, test_e2e_bridge, test_batch_service, test_pickles_wire)
# used to recompile once per module: the per-module jax.clear_caches()
# below exists only to bound JIT-code VMA count under the default
# vm.max_map_count=65530 (accumulated mappings crash later compiles in
# backend_compile_and_load). Raising the sysctl removes the need to drop
# the in-memory jit cache between modules, so cross-module shape reuse
# actually reuses the executable. conftest raises it itself when it can
# (we run as root in CI/driver containers); otherwise the clearing
# fallback keeps the suite green at the old speed.
_MAP_COUNT_PATH = "/proc/sys/vm/max_map_count"
_MAP_COUNT_WANT = 1048576


def _ensure_map_count() -> bool:
    try:
        with open(_MAP_COUNT_PATH) as f:
            have = int(f.read())
        if have >= _MAP_COUNT_WANT:
            return True
        with open(_MAP_COUNT_PATH, "w") as f:
            f.write(str(_MAP_COUNT_WANT))
        with open(_MAP_COUNT_PATH) as f:
            return int(f.read()) >= _MAP_COUNT_WANT
    except OSError:
        return False


_KEEP_JIT_CACHE = _ensure_map_count()


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_code():
    """Free compiled executables between test modules — ONLY when the
    vm.max_map_count raise failed (see _ensure_map_count above).

    Every XLA:CPU executable maps many VMAs of JIT code; a full
    no-persistent-cache suite run accumulates past the default
    vm.max_map_count (65530) and later compiles die with
    segfault/abort inside backend_compile_and_load (observed
    reproducibly at the first pmsm compile after the big verify
    graphs). Dropping the jit caches after each module unloads
    executables nothing holds anymore and keeps the mapping count
    bounded — at the cost of recompiling shapes shared across modules,
    which roughly doubles suite wall time."""
    yield
    if not _KEEP_JIT_CACHE:
        jax.clear_caches()
