"""Headline benchmarks on the attached TPU.

1. Pippenger MSM over the shipped 2^16-point Pallas SRS (the dominant
   cost of IPA verification, reference README.md:469-475).
2. Batched kimchi verification at a REAL-SCALE domain (n = 2^16, the
   SRS-sized domain; reference Wrap runs 2^17 over the same 2^16 SRS,
   README.md:485-486) from a committed proof fixture.

Prints ONE JSON line; the headline metric stays the round-1 MSM metric
(so vs_baseline is comparable across rounds), with the verifier
throughput carried as extra keys:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "kimchi_verify_2e16_proofs_per_sec": X, ...}

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

sys.modules["zstandard"] = None  # see tests/conftest.py: zstd cache segfault

import jax

from mina_bridge_tpu.utils.compile_cache import cache_dir as _cache_dir

jax.config.update("jax_compilation_cache_dir", _cache_dir())
# Only persist expensive executables: XLA's CPU executable serialize()
# segfaults on certain small graphs; the big ones (the only ones worth
# caching) serialize fine.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 20.0)

import jax.numpy as jnp
import numpy as np

RUST_BASELINE_POINTS_PER_SEC = 2.0e6
N = 1 << 16
START = time.time()
# Soft wall-clock budget: the driver runs this on a cold machine; the
# verifier stage is skipped (with a note) if the MSM stage already ate
# the budget, so the headline line always lands.
BUDGET_S = float(os.environ.get("MINA_BRIDGE_TPU_BENCH_BUDGET", "2400"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_msm():
    from mina_bridge_tpu.curves import PALLAS
    from mina_bridge_tpu.curves.srs import load_srs
    from mina_bridge_tpu.fields import ffl
    from mina_bridge_tpu.fields.params import NLIMBS
    from mina_bridge_tpu.ops import pmsm as msm_mod

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
        s = jax.random.randint(key, (N, NLIMBS), 0, 1 << 13, dtype=jnp.int32)
        s = s.at[:, -1].set(s[:, -1] & ((1 << 7) - 1))  # < 2^254 < p
        return msm_mod.msm(PALLAS, s, points)

    f = jax.jit(msm_seeded)
    t0 = time.time()
    out = f(0)
    _ = np.asarray(out)  # hard sync: block_until_ready is unreliable here
    log(f"MSM compile+first run: {time.time() - t0:.1f}s")

    # latency: one synced call (includes the ~23 ms relay dispatch)
    t0 = time.time()
    _ = np.asarray(f(99))
    log(f"MSM 2^16 latency: {(time.time() - t0) * 1e3:.1f} ms")
    # throughput: pipelined dispatches, one sync at the end (serving shape)
    iters = 8
    t0 = time.time()
    outs = [f(i + 1) for i in range(iters)]
    for out in outs:
        _ = np.asarray(out)
    dt = (time.time() - t0) / iters
    pps = N / dt
    log(f"MSM 2^16 pipelined: {dt * 1e3:.1f} ms -> {pps / 1e3:.1f} K points/s")
    global MSM_MS
    MSM_MS = dt * 1e3
    return pps


MSM_MS = None


def bench_verifier(max_batch: int = 32):
    """Batched kimchi verify at n=2^16 from the committed fixture.

    Prefers the largest committed fixture (the transcript's sequential
    poseidon chain dominates wall time and is batch-invariant, so
    proofs/s scales nearly linearly with B until the per-proof MSM rows
    catch up); falls back through smaller batches."""
    from mina_bridge_tpu.curves.srs import srs_points_host
    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
    from mina_bridge_tpu.kimchi import bench_fixtures as bf, verifier

    t0 = time.time()
    # largest committed fixture wins: latency is ~flat in B (measured
    # 2.44 s at B=8 vs 2.52 s at B=16 on the attached TPU), so proofs/s
    # scales ~linearly with the batch
    batch = next(
        (
            b
            for b in (32, 16, 8)
            if b <= max_batch and bf.fixture_path(16, b).exists()
        ),
        2,
    )
    index, proofs = bf.get_fixture(16, batch)
    if batch == 2:
        # Tile the committed 2 distinct proofs into 8 batch slots: the
        # device performs IDENTICAL work to 8 distinct proofs (every
        # slot runs its own full transcript + per-proof MSM rows; the
        # relay result-cache is defeated by fresh per-iteration
        # rand_weights), so proofs/s is measured honestly while the
        # 8-distinct-proof fixture generation (host proving at 2^16,
        # ~hours) runs offline.
        proofs = [proofs[i % 2] for i in range(8)]
    g, h = srs_points_host("pallas", index.domain.n)
    dindex = verifier.DeviceVerifierIndex.from_host(index, g, h)
    dproofs = verifier.DeviceProofs.from_host(proofs)
    B = len(proofs)
    rng = np.random.RandomState(7)
    rw = np.zeros((B, 2, NLIMBS), np.int32)
    for b in range(B):
        for j in range(2):
            rw[b, j] = int_to_limbs(
                int.from_bytes(rng.bytes(16), "little"), NLIMBS
            )
    rw = jnp.asarray(rw)
    log(f"verifier fixture+index ready in {time.time() - t0:.1f}s")

    # host-computed public-commitment hint (untrusted; bound in-MSM):
    # skips the 260-step on-device double-and-add chain
    hint = verifier.host_public_commitments(
        dindex, [p.public for p in proofs]
    )
    leaves, treedef = jax.tree_util.tree_flatten((dproofs, rw, hint))

    def step(*leaves):
        proofs_, rw_, hint_ = jax.tree_util.tree_unflatten(treedef, leaves)
        return verifier.verify(dindex, proofs_, rw_, pub_comm_hint=hint_)

    f = jax.jit(step)
    t0 = time.time()
    ok = np.asarray(f(*leaves))
    log(f"verify compile+first run: {time.time() - t0:.1f}s, ok={bool(ok)}")
    if not bool(ok):
        log("verifier fixture REJECTED — not reporting throughput")
        return None
    # fresh rand_weights per iteration (legitimate verifier randomness;
    # also defeats the relay's identical-input result cache), pipelined
    # dispatches with one sync pass at the end (serving shape)
    iters = 3
    variants = []
    for it in range(iters):
        rw_i = np.asarray(rw).copy()
        for b in range(B):
            for j in range(rw_i.shape[1]):
                rw_i[b, j] = int_to_limbs(
                    int.from_bytes(rng.bytes(16), "little"), NLIMBS
                )
        variants.append(
            jax.tree_util.tree_flatten((dproofs, jnp.asarray(rw_i), hint))[0]
        )
    t0 = time.time()
    outs = [f(*lv) for lv in variants]
    oks = [bool(np.asarray(o)) for o in outs]
    dt = (time.time() - t0) / iters
    assert all(oks), oks
    pps = B / dt
    log(f"kimchi verify n=2^16 B={B}: {dt*1e3:.1f} ms -> {pps:.2f} proofs/s")
    try:
        verify_stage_breakdown(
            dindex, B, R=0, kk=1, total_ms=dt * 1e3, msm_ms=MSM_MS or 0.0
        )
    except Exception as e:
        log("stage breakdown failed:", repr(e))
    return pps


def verify_stage_breakdown(dindex, B, R, kk, total_ms, msm_ms):
    """Per-stage breakdown of the batched verify (SURVEY §5 tracing row):
    times a jitted Poseidon transcript of the SAME op counts the
    verifier's FQ+FR+IPA sponges run at this shape, reuses the measured
    MSM stage, and reports the scalar-identity work as the residual.
    Optional: MINA_BRIDGE_TPU_PROFILE=<dir> captures a jax.profiler
    trace (TensorBoard format) around the timed transcript."""
    from mina_bridge_tpu.fields.params import NLIMBS
    from mina_bridge_tpu.hash import poseidon
    from mina_bridge_tpu.hash.poseidon_params import poseidon_spec
    from mina_bridge_tpu.utils.profiling import METRICS, xla_trace

    nc = dindex.nc
    npub = dindex.npub
    k = 16  # IPA rounds over the 2^16 SRS
    # FQ: digest + prev sg + pub chunks + w/rt + s + z/zl + t points...
    fq_absorbs = 1 + 2 * R + 2 * nc * (1 + 15 + 1 + 5 + 2 + 7)
    fq_squeezes = 6
    # FR: digest + prev chals + pub chunk evals + ft_eval1 + 56*nc pairs
    fr_absorbs = 1 + R * kk + 2 * nc + 1 + 2 * 56 * nc
    fr_squeezes = 2
    # IPA continuation on FQ: vprime (2) + k rounds (4 absorbs+1 squeeze)
    # + delta (2) + final squeeze
    ipa_absorbs = 2 + 4 * k + 2
    ipa_squeezes = 1 + k + 1

    def transcript_fn(spec_name, n_abs, n_sq):
        spec = poseidon_spec(spec_name)

        def run(seed):
            x = (
                jax.random.randint(
                    jax.random.key(seed), (B, NLIMBS), 0, 1 << 13, jnp.int32
                )
            )
            ops = [("absorb", x)] * n_abs + [("squeeze",)] * n_sq
            sq, _ = poseidon.run_transcript(spec, ops, batch_shape=(B,))
            return sq[-1] if sq else x

        return jax.jit(run)

    fq = transcript_fn("fq", fq_absorbs + ipa_absorbs, fq_squeezes + ipa_squeezes)
    fr = transcript_fn("fq", fr_absorbs, fr_squeezes)
    _ = np.asarray(fq(0)), np.asarray(fr(0))  # compile
    tdir = os.environ.get("MINA_BRIDGE_TPU_PROFILE")
    import contextlib

    with xla_trace(tdir) if tdir else contextlib.nullcontext():
        with METRICS.timer("bench_transcript_stage"):
            t0 = time.time()
            _ = np.asarray(fq(1))
            _ = np.asarray(fr(1))
            transcript_ms = (time.time() - t0) * 1e3
    breakdown = {
        "total_ms": round(total_ms, 1),
        "transcript_ms": round(transcript_ms, 1),
        "msm_ms": round(msm_ms, 1),
        "scalar_identity_residual_ms": round(
            max(0.0, total_ms - transcript_ms - msm_ms), 1
        ),
    }
    log("verify stage breakdown:", json.dumps(breakdown))
    return breakdown


def bench_pickles():
    """The REAL Proof-of-State tip shape: wrap 2^17 / step 2^18 over the
    2^16 SRS (chunked commitments) through pickles.batch_verify_tips,
    from the committed fixture (reference README.md:485-486; BASELINE
    config 5). One batched wrap verification (single MSM, accumulators
    re-opened inside) + one batched step (Vesta) verification of the
    wrapped step proofs when the fixture carries them (PARITY D7 device
    path), else the legacy Vesta-side decider MSM."""
    from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
    from mina_bridge_tpu.kimchi import verifier as kv
    from mina_bridge_tpu.pickles import fixtures as pfx
    from mina_bridge_tpu.pickles import verifier as pv

    path = None
    for b in (8, 4, 2):
        cand = pfx.fixture_path(pv.REAL_BLOCK_LOG_N, pv.REAL_STEP_LOG_N, b)
        if cand.exists():
            path = cand
            break
    if path is None:
        log("no committed pickles fixture; skipping tip-verify bench")
        return None
    t0 = time.time()
    bln, sln, tips, host_index, step_host_index = pfx.load_tips(path)
    # a fixture mid-generation (checkpoint-per-tip) may hold fewer tips
    # than its filename batch: truncate to the largest power of two so
    # the compiled shape stays canonical
    pow2 = 1 << (len(tips).bit_length() - 1)
    if len(tips) != pow2:
        log(f"truncating {len(tips)}-tip fixture to B={pow2}")
        tips = tips[:pow2]
    g, h = pv._srs_for("pallas", host_index.domain.n)
    dindex = kv.DeviceVerifierIndex.from_host(host_index, g, h)
    step_dindex = None
    if step_host_index is not None and tips[0].step is not None:
        sg_, sh_ = pv._srs_for("vesta", step_host_index.domain.n)
        step_dindex = kv.DeviceVerifierIndex.from_host(step_host_index, sg_, sh_)
    dtips = pv.device_proofs(tips)
    B = len(tips)
    log(
        f"pickles fixture ready in {time.time()-t0:.1f}s "
        f"(wrap 2^{bln}, step 2^{sln}, B={B}, "
        f"step proofs {'on-device' if step_dindex is not None else 'LEGACY decider'})"
    )
    rng = np.random.RandomState(11)

    def fresh_rw():
        rw = np.zeros((B, 5, NLIMBS), np.int32)
        for bi in range(B):
            for j in range(5):
                rw[bi, j] = int_to_limbs(
                    int.from_bytes(rng.bytes(16), "little"), NLIMBS
                )
        return jnp.asarray(rw)

    def make_run(tips_dev, sd):
        def run():
            return pv.batch_verify_tips(
                tips_dev, fresh_rw(), log_n=bln, step_log_n=sln,
                dindex=dindex, step_dindex=sd,
            )

        return run

    # fallback chain (relay can drop very large executables mid-transfer;
    # the step 2^18 graph is the biggest we ship): full D7 step path
    # first, then the legacy decider path on the same tips.
    import dataclasses as _dc

    attempts = [("step", dtips, step_dindex)]
    if step_dindex is not None:
        attempts.append(("legacy", _dc.replace(dtips, step=None), None))
    run = None
    for name, tips_dev, sd in attempts:
        cand = make_run(tips_dev, sd)
        t0 = time.time()
        try:
            ok = bool(np.asarray(cand()))
        except Exception as e:
            log(f"pickles {name} path failed ({type(e).__name__}: {e}); "
                "falling back" if name == "step" else f"pickles {name} path failed")
            continue
        log(
            f"pickles verify compile+first run [{name}]: "
            f"{time.time()-t0:.1f}s, ok={ok}"
        )
        if not ok:
            log("pickles fixture REJECTED — not reporting throughput")
            return None
        run = cand
        break
    if run is None:
        log("pickles bench: all paths failed")
        return None
    iters = 3
    t0 = time.time()
    outs = [run() for _ in range(iters)]
    oks = [bool(np.asarray(o)) for o in outs]
    dt = (time.time() - t0) / iters
    assert all(oks), oks
    pps = B / dt
    log(
        f"pickles tip verify wrap 2^{bln}/step 2^{sln} B={B}: "
        f"{dt*1e3:.1f} ms -> {pps:.2f} proofs/s"
    )
    return pps


def main():
    log("devices:", jax.devices())
    result = {
        "metric": "pallas_msm_2e16_points_per_sec",
        "unit": "points/s",
    }
    pps = bench_msm()
    result["value"] = round(pps)
    result["vs_baseline"] = round(pps / RUST_BASELINE_POINTS_PER_SEC, 3)
    # land the headline line NOW (the verifier stage may exceed the
    # driver's budget on a cold machine); a combined line with the same
    # keys plus the verifier metric is printed after, so the last
    # parseable JSON line always carries the most information.
    print(json.dumps(result), flush=True)

    elapsed = time.time() - START
    if elapsed < BUDGET_S * 0.75:
        # the relayed device's remote-compile endpoint has been seen to
        # drop very large executables mid-transfer; retry once, then
        # fall back to the next-smaller committed batch shape
        for max_batch in (32, 32, 16, 8):
            try:
                vps = bench_verifier(max_batch=max_batch)
                if vps is not None:
                    result["kimchi_verify_2e16_proofs_per_sec"] = round(vps, 3)
                    print(json.dumps(result), flush=True)
                break
            except Exception as e:
                log(f"verifier bench failed (max B={max_batch}):", repr(e))
            if time.time() - START > BUDGET_S * 0.85:
                log("verifier retry budget exhausted")
                break
    else:
        log(f"skipping verifier bench (elapsed {elapsed:.0f}s)")

    elapsed = time.time() - START
    if elapsed < BUDGET_S * 0.9:
        try:
            tps = bench_pickles()
            if tps is not None:
                result["pickles_tip_verify_proofs_per_sec"] = round(tps, 3)
                print(json.dumps(result), flush=True)
        except Exception as e:
            log("pickles bench failed:", repr(e))
    else:
        log(f"skipping pickles bench (elapsed {elapsed:.0f}s)")


if __name__ == "__main__":
    main()
