"""Kernel-level microbenchmarks on the attached TPU.

Usage: python scripts/bench_kernels.py [padd|prims] [matrix|legacy]

  padd  — fused point-add kernel throughput (adds/s) under the selected
          fold mode (A/B for the one-shot matrix fold).
  prims — raw primitive throughputs: int32 add/mul elementwise, and
          matmul formulations (f32 / bf16 / int8->int32 dot) to answer
          the "can the MXU help the limb arithmetic?" question with data
          (VERDICT round-1 item 4).

Timings sync with a scalar reduction pulled to host (np.asarray of the
full output would drag MBs through the relay; block_until_ready is
unreliable under the axon plugin — see CLAUDE.md).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

mode = sys.argv[2] if len(sys.argv) > 2 else "matrix"
os.environ["MINA_BRIDGE_TPU_FOLD"] = mode
os.environ.setdefault("MINA_BRIDGE_TPU_CACHE", "/tmp/mina_bridge_tpu_cache")
sys.modules["zstandard"] = None

import jax

from mina_bridge_tpu.utils.compile_cache import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 20.0)

import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jnp.sum(x.astype(jnp.int64) if x.dtype == jnp.int32 else x))


def timeit(f, *args, iters=8):
    out = f(*args)
    _ = sync(out)  # compile + warm
    t0 = time.time()
    outs = [f(*args) for _ in range(iters)]
    for o in outs:
        _ = sync(o)
    return (time.time() - t0) / iters


def bench_padd():
    import random

    from mina_bridge_tpu.curves import PALLAS
    from mina_bridge_tpu.curves import host as hc
    from mina_bridge_tpu.curves import pallas_kernels as pk
    from mina_bridge_tpu.fields import ffl

    c = PALLAS
    N = 64 * 1024
    rng = random.Random(42)
    # a handful of random projective points, tiled to N lanes
    base = []
    for _ in range(8):
        pt = hc.mul(c, rng.randrange(1, c.scalar.p), c.generator)
        base.append([pt[0], pt[1], 1])
    arrs = np.stack(
        [
            np.stack(
                [np.asarray(ffl.from_int(c.base, coord)) for coord in p]
            )
            for p in base
        ]
    )  # (8, 3, L)
    pts = jnp.asarray(np.tile(arrs, (N // 8, 1, 1)))  # (N, 3, L)
    rows_pts = pk.to_rows(pts)
    q = jnp.roll(rows_pts, 1, axis=-1)

    f = jax.jit(lambda a, b: pk.padd(c, a, b))
    dt = timeit(f, rows_pts, q)
    print(f"padd[{mode}]: {N/dt/1e6:.2f} M adds/s  ({dt*1e3:.1f} ms / {N} lanes)")

    fd = jax.jit(lambda a: pk.pdouble(c, a))
    dt = timeit(fd, rows_pts)
    print(f"pdouble[{mode}]: {N/dt/1e6:.2f} M dbls/s ({dt*1e3:.1f} ms)")

    fm = jax.jit(
        lambda a, b: pk.padd_mixed_select(
            c,
            a,
            b,
            jnp.zeros((N,), jnp.int32),
            jnp.zeros((N,), jnp.int32),
        )
    )
    dt = timeit(fm, rows_pts, q)
    print(f"padd_mixed[{mode}]: {N/dt/1e6:.2f} M adds/s ({dt*1e3:.1f} ms)")


def bench_prims():
    key = jax.random.key(0)
    N = 8 * 1024 * 1024
    a = jax.random.randint(key, (N,), 0, 8192, dtype=jnp.int32)
    b = jnp.roll(a, 1)

    f_add = jax.jit(lambda x, y: x + y)
    f_mul = jax.jit(lambda x, y: x * y)
    dt = timeit(f_add, a, b)
    print(f"int32 add: {N/dt/1e9:.2f} G ops/s")
    dt = timeit(f_mul, a, b)
    print(f"int32 mul: {N/dt/1e9:.2f} G ops/s")

    # matmul roofs: M=N=K=2048
    M = 2048
    af = jax.random.normal(key, (M, M), jnp.float32)
    f32 = jax.jit(lambda x: x @ x)
    dt = timeit(f32, af)
    print(f"f32 matmul {M}^3: {2*M**3/dt/1e12:.2f} T flop/s")
    ab = af.astype(jnp.bfloat16)
    fb = jax.jit(lambda x: (x @ x))
    dt = timeit(fb, ab)
    print(f"bf16 matmul {M}^3: {2*M**3/dt/1e12:.2f} T flop/s")
    ai = jax.random.randint(key, (M, M), -128, 127, dtype=jnp.int8)
    fi = jax.jit(
        lambda x: jax.lax.dot_general(
            x,
            x,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    )
    dt = timeit(fi, ai)
    print(f"int8->int32 matmul {M}^3: {2*M**3/dt/1e12:.2f} T ops/s")
    ai32 = ai.astype(jnp.int32)
    fi32 = jax.jit(
        lambda x: jax.lax.dot_general(
            x,
            x,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    )
    dt = timeit(fi32, ai32)
    print(f"int32 matmul {M}^3: {2*M**3/dt/1e12:.2f} T ops/s")

    # batched-matvec shape (the banded limb-conv formulation): (L,43,22)@(L,22)
    L = 65536
    bm = jax.random.randint(key, (L, 43, 22), 0, 8192, dtype=jnp.int32)
    bv = jax.random.randint(key, (L, 22), 0, 8192, dtype=jnp.int32)
    fbm = jax.jit(
        lambda m, v: jnp.einsum(
            "lij,lj->li", m, v, preferred_element_type=jnp.int32
        )
    )
    dt = timeit(fbm, bm, bv)
    print(
        f"batched int32 matvec (L=65536,43x22): {L*43*22/dt/1e9:.2f} G mac/s"
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), "fold:", mode)
    what = sys.argv[1] if len(sys.argv) > 1 else "padd"
    if what == "padd":
        bench_padd()
    else:
        bench_prims()
