"""IPA: host prover/verifier self-consistency + device batched verification."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mina_bridge_tpu.commitment import ipa
from mina_bridge_tpu.curves import PALLAS, host as hc
from mina_bridge_tpu.fields import ff
from mina_bridge_tpu.fields.params import NLIMBS, int_to_limbs
from mina_bridge_tpu.curves.srs import srs_points_host
from mina_bridge_tpu.hash import poseidon
from mina_bridge_tpu.hash.poseidon_params import poseidon_spec

N = 16  # tiny SRS for tests (k = 4 rounds)
M = 2  # polynomials per proof
NPTS = 2  # evaluation points


def make_proof(rng, curve, g, h):
    ps = curve.scalar.p
    polys = [[rng.randrange(ps) for _ in range(N)] for _ in range(M)]
    blinds = [rng.randrange(ps) for _ in range(M)]
    comms = [ipa.host_commit(curve, g, h, f, b) for f, b in zip(polys, blinds)]
    xs = [rng.randrange(ps) for _ in range(NPTS)]
    evals = [
        [sum(cd * pow(x, d, ps) for d, cd in enumerate(f)) % ps for x in xs]
        for f in polys
    ]
    prover = ipa.HostIpaProver(curve, g, h, rng)
    proof, info = prover.open(polys, blinds, comms, xs)
    return comms, xs, evals, proof, info


@pytest.fixture(scope="module")
def setup():
    curve = PALLAS
    g, h = srs_points_host("pallas", N)
    rng = random.Random(42)
    cases = [make_proof(rng, curve, g, h) for _ in range(2)]
    return curve, g, h, cases


def test_host_roundtrip(setup):
    curve, g, h, cases = setup
    for comms, xs, evals, proof, info in cases:
        assert ipa.host_verify(curve, g, h, comms, xs, evals, proof)
    # tampered eval fails
    comms, xs, evals, proof, info = cases[0]
    bad = [list(e) for e in evals]
    bad[0][0] = (bad[0][0] + 1) % curve.scalar.p
    assert not ipa.host_verify(curve, g, h, comms, xs, bad, proof)


def _to_dev(curve, cases):
    def aff(pts):  # list of (x,y) -> (B?, 2, NLIMBS)
        return np.array(
            [[int_to_limbs(p[0], NLIMBS), int_to_limbs(p[1], NLIMBS)] for p in pts],
            dtype=np.int32,
        )

    B = len(cases)
    k = len(cases[0][3].lr)
    comms = np.stack([aff(c[0]) for c in cases])
    evals = np.array(
        [
            [[int_to_limbs(e, NLIMBS) for e in row] for row in c[2]]
            for c in cases
        ],
        dtype=np.int32,
    )
    eval_points = np.array(
        [[int_to_limbs(x, NLIMBS) for x in c[1]] for c in cases], dtype=np.int32
    )
    lr = np.array(
        [
            [
                [
                    [int_to_limbs(L[0], NLIMBS), int_to_limbs(L[1], NLIMBS)],
                    [int_to_limbs(R[0], NLIMBS), int_to_limbs(R[1], NLIMBS)],
                ]
                for (L, R) in c[3].lr
            ]
            for c in cases
        ],
        dtype=np.int32,
    )
    delta = np.stack([aff([c[3].delta])[0] for c in cases])
    sg = np.stack([aff([c[3].sg])[0] for c in cases])
    z1 = np.stack([int_to_limbs(c[3].z1, NLIMBS) for c in cases])
    z2 = np.stack([int_to_limbs(c[3].z2, NLIMBS) for c in cases])
    u_sel, u_hint = ipa.u_hint_arrays([c[3] for c in cases])
    return ipa.DeviceOpenings(
        commitments=jnp.asarray(comms),
        evals=jnp.asarray(evals),
        eval_points=jnp.asarray(eval_points),
        lr=jnp.asarray(lr),
        delta=jnp.asarray(delta),
        sg=jnp.asarray(sg),
        z1=jnp.asarray(z1),
        z2=jnp.asarray(z2),
        u_sel=jnp.asarray(u_sel),
        u_hint=jnp.asarray(u_hint),
    )


def test_device_batch_verify(setup):
    curve, g, h, cases = setup
    openings = _to_dev(curve, cases)
    g_aff = np.array(
        [[int_to_limbs(p[0], NLIMBS), int_to_limbs(p[1], NLIMBS)] for p in g],
        dtype=np.int32,
    )
    h_aff = np.array(
        [int_to_limbs(h[0], NLIMBS), int_to_limbs(h[1], NLIMBS)], dtype=np.int32
    )
    rng = random.Random(7)
    rw = np.array(
        [
            [
                int_to_limbs(rng.randrange(curve.scalar.p), NLIMBS),
                int_to_limbs(rng.randrange(curve.scalar.p), NLIMBS),
            ]
            for _ in cases
        ],
        dtype=np.int32,
    )
    ok = ipa.batch_verify(
        curve, jnp.asarray(g_aff), jnp.asarray(h_aff), openings, jnp.asarray(rw)
    )
    assert bool(ok)

    # tamper one z1 -> whole batch check fails
    bad = ipa.DeviceOpenings(
        **{
            **openings.__dict__,
            "z1": openings.z1.at[0, 0].add(1),
        }
    )
    ok_bad = ipa.batch_verify(
        curve, jnp.asarray(g_aff), jnp.asarray(h_aff), bad, jnp.asarray(rw)
    )
    assert not bool(ok_bad)


def test_run_transcript_matches_sponge(rng):
    ps = poseidon_spec("fp")
    vals = [rng.randrange(ps.field.p) for _ in range(7)]
    seq = ["a", "a", "s", "a", "a", "a", "s", "s", "a", "s"]
    # reference: op-by-op sponge
    ref = poseidon.Sponge(ps)
    it = iter(vals)
    ref_out = []
    ops = []
    for op in seq:
        if op == "a":
            x = ff.from_int(ps.field, next(it))
            ref.absorb(x)
            ops.append(("absorb", x))
        else:
            ref_out.append(ff.to_int(ref.squeeze()))
            ops.append(("squeeze",))
    got, cont = poseidon.run_transcript(ps, ops)
    assert [ff.to_int(x) for x in got] == ref_out
    # continuation matches too
    ref.absorb(ff.from_int(ps.field, 123))
    more_ref = ff.to_int(ref.squeeze())
    got2, _ = poseidon.run_transcript(
        ps, [("absorb", ff.from_int(ps.field, 123)), ("squeeze",)], sponge=cont
    )
    assert ff.to_int(got2[0]) == more_ref


@pytest.mark.parametrize("k", [2, 4, 7])
def test_device_rho_s_sum_matches_unfused(rng, k):
    """The fused outer-product G-row scalars (-sum_b rho_b s_b, canon)
    are bit-identical to the host oracle at even and odd k splits."""
    fs = PALLAS.scalar
    n = 1 << k
    B = 3
    chal_ints = [[rng.randrange(fs.p) for _ in range(B)] for _ in range(k)]
    rho_ints = [rng.randrange(fs.p) for _ in range(B)]
    from mina_bridge_tpu.fields import ffl

    chals = [
        ffl.from_canon(
            jnp.asarray([int_to_limbs(c, NLIMBS) for c in col], jnp.int32)
        )
        for col in chal_ints
    ]
    rho = ffl.from_canon(
        jnp.asarray([int_to_limbs(r, NLIMBS) for r in rho_ints], jnp.int32)
    )
    got = np.asarray(jax.jit(
        lambda ch, r: ipa.device_rho_s_sum(fs, ch, r, n)
    )(chals, rho))
    # host oracle: s_b from host_s_vector over the SAME challenge order
    want = np.zeros((n, NLIMBS), np.int64)
    tot = [0] * n
    for b in range(B):
        s_b = ipa.host_s_vector([chal_ints[i][b] for i in range(k)], fs.p)
        for j in range(n):
            tot[j] = (tot[j] - rho_ints[b] * s_b[j]) % fs.p
    for j in range(n):
        want[j] = np.asarray(int_to_limbs(tot[j], NLIMBS))
    assert np.array_equal(got, want)
