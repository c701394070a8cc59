"""mina_bridge_tpu: a TPU-native Mina -> Ethereum ZK state bridge framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lambdaclass/mina_bridge (reference at /root/reference): Pasta field
arithmetic, Poseidon sponge, Pippenger MSM, IPA polynomial commitments and
the Kimchi/Pickles verifier as batched, shardable TPU programs, plus the
bridge orchestration layers (Mina GraphQL acquisition, proof model,
Ethereum settlement, SDK, CLI).
"""

__version__ = "0.1.0"
