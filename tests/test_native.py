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
