"""Native C++ runtime components vs the pure-Python oracles."""

import random

import pytest

from mina_bridge_tpu import native
from mina_bridge_tpu.bridge.keccak import keccak256, keccak256_py


def test_keccak_known_vector():
    # Ethereum's keccak256("") — distinguishes Keccak from NIST SHA3
    assert (
        keccak256_py(b"").hex()
        == "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_native_matches_python():
    if not native.available():
        pytest.skip("no C++ toolchain")
    rng = random.Random(1)
    cases = [b"", b"a", b"abc" * 100]
    cases += [rng.randbytes(rng.randrange(0, 500)) for _ in range(50)]
    # rate-boundary lengths (136-byte blocks)
    cases += [bytes(n) for n in (135, 136, 137, 271, 272, 273)]
    for data in cases:
        assert native.keccak256(data) == keccak256_py(data), len(data)
    assert native.keccak256_batch(cases) == [keccak256_py(x) for x in cases]


def test_dispatcher_equals_python():
    assert keccak256(b"mina_bridge_tpu") == keccak256_py(b"mina_bridge_tpu")


def test_native_merkle_levels():
    rng = random.Random(2)
    leaves = [rng.randbytes(32) for _ in range(8)]
    levels = native.merkle_levels(leaves)
    # oracle
    level, want = leaves, []
    while len(level) > 1:
        level = [
            keccak256_py(level[i] + level[i + 1])
            for i in range(0, len(level), 2)
        ]
        want.append(level)
    assert levels == want


def test_batch_merkle_root_consistent():
    """bridge.aligned's tree (duplicate-last padding) agrees with the
    native level builder on power-of-two batches."""
    from mina_bridge_tpu.bridge import aligned

    rng = random.Random(3)
    leaves = [rng.randbytes(32) for _ in range(4)]
    root, proofs = aligned.build_batch_merkle(leaves)
    levels = native.merkle_levels(leaves)
    assert root == levels[-1][0]
    for i in range(4):
        assert aligned.verify_batch_inclusion(leaves[i], proofs[i], i, root)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_pasta_field_and_poseidon():
    """Native Montgomery field core + Poseidon permute vs Python oracle."""
    from mina_bridge_tpu.hash import poseidon as pos
    from mina_bridge_tpu.hash.poseidon_params import poseidon_spec

    rng = random.Random(11)
    for name in ("fp", "fq"):
        ps = poseidon_spec(name)
        p = ps.field.p
        st = [rng.randrange(p) for _ in range(3)]
        assert native.poseidon_permute(ps, st) == pos.host_permute_py(ps, st)
        vals = [rng.randrange(p) for _ in range(7)] + [0]
        inv = native.field_inv_batch(p, vals)
        assert inv[-1] == 0
        assert all(inv[i] * vals[i] % p == 1 for i in range(7))


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_ntt_and_eval():
    from mina_bridge_tpu.kimchi.domain import Domain, _ntt_py, poly_eval

    rng = random.Random(12)
    from mina_bridge_tpu.fields.params import FP

    dom = Domain(FP, 5)
    p = FP.p
    a = [rng.randrange(p) for _ in range(dom.n)]
    assert native.ntt(p, a, dom.omega) == _ntt_py(list(a), dom.omega, p)
    s0, r = rng.randrange(p), rng.randrange(p)
    want = [(a[i] * s0 * pow(r, i, p)) % p for i in range(len(a))]
    assert native.scale_geometric(p, a, s0, r) == want
    xs = [rng.randrange(p) for _ in range(3)]
    # oracle: pure-python Horner
    def horner(cs, x):
        acc = 0
        for cv in reversed(cs):
            acc = (acc * x + cv) % p
        return acc
    assert native.poly_eval(p, a, xs) == [horner(a, x) for x in xs]


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_msm_vs_host_oracle():
    from mina_bridge_tpu.curves import PALLAS, VESTA, host as hc

    rng = random.Random(13)
    for c in (PALLAS, VESTA):
        g = c.generator
        pts = [
            hc.mul_affine_ladder(c, rng.randrange(1, 1 << 48), g)
            for _ in range(12)
        ]
        ks = [rng.randrange(c.scalar.p) for _ in range(12)]
        assert native.msm(c.base.p, pts, ks) == hc.fast_msm(c, ks, pts)
        # cancellation to identity and duplicate points
        assert native.msm(c.base.p, [g, g], [5, c.scalar.p - 5]) is None
        assert native.msm(c.base.p, [g, g], [4, 4]) == hc.fast_msm(
            c, [8], [g]
        )
