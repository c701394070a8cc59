"""Headline benchmark: Pippenger MSM over the shipped 2^16-point Pallas SRS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md) —
its MSM runs in the pinned Rust `poly-commitment`/`ark-ec` crates with
rayon on a many-core host. We benchmark against a documented estimate of
that stack: 2.0e6 points/sec for a full 2^16 MSM on a modern multi-core
server (arkworks Pippenger ~30ms at this size). vs_baseline = ours/that.
"""

import json
import os
import sys
import time

os.environ.setdefault("MINA_BRIDGE_TPU_CACHE", "/tmp/mina_bridge_tpu_cache")

import sys

sys.modules["zstandard"] = None  # see tests/conftest.py: zstd cache segfault

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/mina_bridge_tpu_jax_cache")
# Only persist expensive executables: XLA's CPU executable serialize()
# segfaults on certain small graphs; the big ones (the only ones worth
# caching) serialize fine.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 20.0)

import jax.numpy as jnp
import numpy as np

RUST_BASELINE_POINTS_PER_SEC = 2.0e6
N = 1 << 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from mina_bridge_tpu.curves import PALLAS, jaxcurve as jc
    from mina_bridge_tpu.curves.srs import load_srs
    from mina_bridge_tpu.fields import ffl
    from mina_bridge_tpu.fields.params import NLIMBS
    from mina_bridge_tpu.ops import pmsm as msm_mod

    log("devices:", jax.devices())
    t0 = time.time()
    srs = load_srs("pallas", N)
    log(f"SRS loaded in {time.time() - t0:.1f}s")

    # SRS affine -> projective REP points on device
    g = srs["g"]  # (N, 2, NLIMBS) int32 canonical limbs
    x = jnp.pad(jnp.asarray(g[:, 0]), ((0, 0), (0, ffl.REP_LIMBS - NLIMBS)))
    y = jnp.pad(jnp.asarray(g[:, 1]), ((0, 0), (0, ffl.REP_LIMBS - NLIMBS)))
    z = jnp.zeros_like(x).at[:, 0].set(1)
    points = jnp.stack([x, y, z], axis=1)  # (N, 3, L)

    # Scalars are generated ON DEVICE from a seed (as in production,
    # where they come from the on-device Fiat-Shamir transcript): fresh
    # per iteration so the relayed device cannot serve a cached execution
    # result (observed: repeating identical inputs returns in ~0.2ms),
    # without measuring a 5 MB host->device transfer per iteration.
    def msm_seeded(seed):
        key = jax.random.key(seed)
        s = jax.random.randint(
            key, (N, NLIMBS), 0, 1 << 13, dtype=jnp.int32
        )
        s = s.at[:, -1].set(s[:, -1] & ((1 << 7) - 1))  # < 2^254 < p
        return msm_mod.msm(PALLAS, s, points)

    f = jax.jit(msm_seeded)
    t0 = time.time()
    out = f(0)
    _ = np.asarray(out)  # hard sync: block_until_ready is unreliable here
    log(f"compile+first run: {time.time() - t0:.1f}s")

    iters = 5
    t0 = time.time()
    for i in range(iters):
        out = f(i + 1)
        _ = np.asarray(out)
    dt = (time.time() - t0) / iters
    pps = N / dt
    log(f"MSM 2^16: {dt * 1e3:.1f} ms -> {pps / 1e3:.1f} K points/s")

    print(
        json.dumps(
            {
                "metric": "pallas_msm_2e16_points_per_sec",
                "value": round(pps),
                "unit": "points/s",
                "vs_baseline": round(pps / RUST_BASELINE_POINTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
