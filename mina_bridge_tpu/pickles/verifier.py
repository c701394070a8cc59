"""Pickles-layer tip-proof verification (block-verifier stand-in).

In the reference, the candidate tip's Pickles proof is verified by
OpenMina's block verifier (reference README.md:306-313, `mina-tree`):
a Step/Wrap recursive Kimchi proof whose public input is the state hash.
Here the same role is played by our kimchi-style proof system
(kimchi/): `block_circuit()` is a circuit whose single public input IS
the tip state hash, `prove_tip` produces the proof (host prover) and
`batch_verify_tips` verifies many tips at once on TPU. The recursive
accumulator plumbing (absorbing the previous proof's `sg`, README.md
534-544) rides on the IPA layer's sg handling.

Swapping in the real Pickles step/wrap constraint system is a
VerifierIndex data change plus gate evaluators — the verification
pipeline (oracles -> linearization -> one batched MSM) is this one.
"""

from __future__ import annotations

import functools
import random

from ..curves import PALLAS
from ..curves.srs import srs_points_host
from ..kimchi import prover_host, verifier as kv
from ..kimchi.circuit import COLUMNS, CircuitBuilder

BLOCK_LOG_N = 4  # fixture domain; real Wrap domain is 2^17 (README.md:486)


@functools.cache
def block_setup(log_n: int = BLOCK_LOG_N):
    """(circuit, host index, device index, g, h) for the block circuit."""
    curve = PALLAS
    b = CircuitBuilder(curve.scalar, log_n)
    b.public_input()  # the state hash
    circuit = b.build()
    g, h = srs_points_host("pallas", circuit.n)
    index = prover_host.setup(circuit, curve, g, h)
    dindex = kv.DeviceVerifierIndex.from_host(index, g, h)
    return circuit, index, dindex, g, h


def prove_tip(state_hash: int, rng=None, log_n: int = BLOCK_LOG_N):
    """Produce a tip proof binding `state_hash` as the public input."""
    circuit, index, _, g, h = block_setup(log_n)
    rng = rng or random.Random(0xB10C)
    n = circuit.n
    w = [[0] * n for _ in range(COLUMNS)]
    w[0][0] = state_hash % PALLAS.scalar.p
    return prover_host.prove(
        index, circuit, w, [state_hash % PALLAS.scalar.p], g, h, rng
    )


def device_proofs(proofs) -> "kv.DeviceProofs":
    return kv.DeviceProofs.from_host(proofs)


def batch_verify_tips(dproofs: "kv.DeviceProofs", rand_weights, log_n: int = BLOCK_LOG_N):
    _, _, dindex, _, _ = block_setup(log_n)
    return kv.verify(dindex, dproofs, rand_weights)
