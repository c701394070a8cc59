"""Roofline evidence for the MSM sort stage (BENCH_NOTES Session 5).

Measures, on the attached TPU:
  1. effective HBM streaming bandwidth (big elementwise add, scalar sync)
  2. jax.lax.sort of the MSM's packed (20, 65536) int32 keys in isolation
  3. the implied bitonic traffic model: ceil(log2 N)*(log2 N + 1)/2
     compare-exchange passes over the array

If (2) ~= model_traffic / (1), the sort runs at the device's memory
roofline and a radix rewrite could only win by its traffic ratio
(~6 passes vs 136) while paying scatter ops the TPU vector ISA lacks.
"""

import os
import sys
import time

os.environ.setdefault("MINA_BRIDGE_TPU_CACHE", "/tmp/mina_bridge_tpu_cache")
sys.modules["zstandard"] = None

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jnp.sum(x))  # scalar reduce: don't pull tensors


def main():
    print("devices:", jax.devices(), flush=True)

    # 1. HBM streaming bandwidth: y = x + 1 over 64 MB, 3 reps in-graph
    nbytes = 64 << 20
    n = nbytes // 4

    @jax.jit
    def stream(seed):
        x = jax.random.randint(jax.random.key(seed), (n,), 0, 100, jnp.int32)
        for _ in range(3):
            x = x + 1
        return jnp.sum(x)

    _ = np.asarray(stream(0))
    t0 = time.time()
    iters = 4
    for i in range(iters):
        _ = np.asarray(stream(i + 1))
    dt = (time.time() - t0) / iters
    # traffic: randint write + 3x(read+write) + reduce read = 8 passes
    bw = 8 * nbytes / dt / 1e9
    print(f"stream: {dt*1e3:.1f} ms -> ~{bw:.1f} GB/s effective", flush=True)

    # 2. the MSM's exact sort shape
    W, N = 20, 1 << 16

    @jax.jit
    def sort_keys(seed):
        k = jax.random.randint(
            jax.random.key(seed), (W, N), 0, 1 << 30, jnp.int32
        )
        return jnp.sum(jax.lax.sort(k, dimension=-1))

    @jax.jit
    def keys_only(seed):
        k = jax.random.randint(
            jax.random.key(seed), (W, N), 0, 1 << 30, jnp.int32
        )
        return jnp.sum(k)

    _ = np.asarray(sort_keys(0)), np.asarray(keys_only(0))
    t0 = time.time()
    for i in range(iters):
        _ = np.asarray(sort_keys(i + 1))
    t_sort = (time.time() - t0) / iters
    t0 = time.time()
    for i in range(iters):
        _ = np.asarray(keys_only(i + 1))
    t_base = (time.time() - t0) / iters
    sort_ms = (t_sort - t_base) * 1e3
    print(
        f"lax.sort (20, 65536) int32: {sort_ms:.1f} ms "
        f"(total {t_sort*1e3:.1f}, baseline {t_base*1e3:.1f})",
        flush=True,
    )

    # 3. bitonic model
    lg = 16
    passes = lg * (lg + 1) // 2
    traffic = passes * 2 * W * N * 4  # read+write per pass
    model_ms = traffic / (bw * 1e9) * 1e3
    print(
        f"bitonic model: {passes} passes x {2*W*N*4/1e6:.1f} MB = "
        f"{traffic/1e9:.2f} GB -> {model_ms:.1f} ms at {bw:.1f} GB/s "
        f"(measured {sort_ms:.1f} ms => "
        f"{'memory-roofline-bound' if sort_ms < 1.6 * model_ms else 'NOT bandwidth-bound'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
