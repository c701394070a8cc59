"""Proof submission + the TPU-backed batch verification service.

Mirror of the reference's aligned module (core/src/aligned.rs): proofs
are serialized (aligned.rs:33-36), optionally dumped to `.proof`/`.pub`
files (aligned.rs:60-69, SAVE_PROOF), then submitted for batch
verification; the returned `AlignedVerificationData` (proof commitment,
batch merkle root, inclusion proof, index) is what the settlement
contracts check on Ethereum (eth.rs:185-203).

In the reference, verification happens on the remote Aligned operator
fleet. Here the batcher/operator role is played by `TpuVerifierService`:
it runs the Proof-of-State / Proof-of-Account verifiers of
bridge/verifier_service.py (Poseidon hashing, consensus, tip proofs and
the one-MSM opening checks all on TPU) and builds the same keccak batch
Merkle tree the contracts consume. SURVEY §2c: the operator fleet is
replaced by batch/point sharding over TPU meshes.
"""

from __future__ import annotations

import dataclasses
import pathlib

from . import proof_model as pm
from . import verifier_service as vs
from .keccak import keccak256

PROVING_SYSTEM_MINA = b"mina_bridge_tpu:ProvingSystemId:Mina"
PROVING_SYSTEM_MINA_ACCOUNT = b"mina_bridge_tpu:ProvingSystemId:MinaAccount"


def proving_system_commitment(tag: bytes) -> bytes:
    return keccak256(tag)


@dataclasses.dataclass
class AlignedVerificationData:
    proof_commitment: bytes
    pub_input_commitment: bytes
    proving_system_aux_commitment: bytes
    batch_merkle_root: bytes
    batch_inclusion_proof: list[bytes]
    index_in_batch: int

    def merkle_proof_bytes(self) -> bytes:
        return b"".join(self.batch_inclusion_proof)


def leaf_commitment(
    proof_bytes: bytes, pub_bytes: bytes, system_tag: bytes
) -> bytes:
    """Leaf = keccak(proof commitment || pub-input commitment || system)."""
    return keccak256(
        keccak256(proof_bytes)
        + keccak256(pub_bytes)
        + proving_system_commitment(system_tag)
    )


def build_batch_merkle(leaves: list[bytes]) -> tuple[bytes, list[list[bytes]]]:
    """Keccak Merkle tree (duplicate-last padding). Returns (root, proofs)."""
    n = len(leaves)
    assert n >= 1
    level = list(leaves)
    proofs: list[list[bytes]] = [[] for _ in range(n)]
    index = list(range(n))
    while len(level) > 1:
        if len(level) % 2:
            level.append(level[-1])
        nxt = []
        for i in range(0, len(level), 2):
            nxt.append(keccak256(level[i] + level[i + 1]))
        for j in range(n):
            idx = index[j]
            sib = idx ^ 1
            proofs[j].append(level[sib if sib < len(level) else idx])
            index[j] = idx // 2
        level = nxt
    return level[0], proofs


def verify_batch_inclusion(
    leaf: bytes, proof: list[bytes], index: int, root: bytes
) -> bool:
    h = leaf
    for sib in proof:
        if index & 1:
            h = keccak256(sib + h)
        else:
            h = keccak256(h + sib)
        index >>= 1
    return h == root


def save_proof_files(
    directory: str, name: str, proof_bytes: bytes, pub_bytes: bytes
) -> None:
    """SAVE_PROOF dump (reference aligned.rs:60-69 writes
    `mina_state.proof` / `mina_state.pub`)."""
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{name}.proof").write_bytes(proof_bytes)
    (d / f"{name}.pub").write_bytes(pub_bytes)


class TpuVerifierService:
    """The batcher+operator replacement: verify, then batch-commit."""

    def __init__(
        self,
        block_log_n: int | None = None,
        on_batch_root=None,
        step_log_n: int | None = None,
        dindex=None,
        step_dindex=None,
        require_step_proofs: bool = True,
    ):
        if block_log_n is None:
            # track the pickles wrap fixture domain: a stale literal here
            # broke every default-constructed service when the wrap
            # circuit outgrew 2^4 rows (round-2 deferred-values gadget)
            from ..pickles.verifier import BLOCK_LOG_N

            block_log_n = BLOCK_LOG_N
        self.block_log_n = block_log_n
        self.step_log_n = step_log_n  # None -> pickles default
        # optional preloaded wrap/step verifier indexes (fixture-backed;
        # skips multi-minute setup at real scale)
        self.dindex = dindex
        self.step_dindex = step_dindex
        # adversarial submissions MUST carry the wrapped step proof so
        # verification is fully on-device (PARITY D7); legacy
        # accumulator-only tips are only acceptable from trusted fixtures
        self.require_step_proofs = require_step_proofs
        self.pending: list[tuple[bytes, bytes, bytes]] = []
        # operator hook: post the batch root to the on-chain registry
        self.on_batch_root = on_batch_root

    def submit_states(
        self,
        pubs: list[pm.MinaStatePubInputs],
        proofs: list[pm.MinaStateProof],
        tip_proofs_host: list,
        rand_weights=None,
    ) -> list["vs.StateVerificationResult"]:
        """Batched Proof-of-State submission — THE serving path: all 17*B
        protocol-state hashes run as one device Poseidon batch and all B
        tip proofs verify through one batched MSM (per-proof verdicts via
        verifier_service._tip_verdicts). Proofs that verify join the
        pending batch; per-proof results are returned so one bad
        submission never blocks the rest (reference bar: Aligned operator
        batch verification, README.md:213-215).

        rand_weights is a TEST SEAM: production callers leave it None and
        the service samples OS entropy itself, after the proofs are in
        hand (the RLC/hint-binding soundness precondition, PARITY D11)."""
        from ..pickles import verifier as pickles

        if self.require_step_proofs and any(
            t.step is None for t in tip_proofs_host
        ):
            return [
                vs.StateVerificationResult(
                    False, "tip proof missing wrapped step proof"
                )
                for _ in pubs
            ]
        dtips = pickles.device_proofs(tip_proofs_host)
        if rand_weights is None:
            rand_weights = vs.system_rand_weights(len(pubs))
        results = vs.verify_states_batch(
            pubs, proofs, self.block_log_n, dtips, rand_weights,
            step_log_n=self.step_log_n,
            dindex=self.dindex,
            step_dindex=self.step_dindex,
        )
        from .sol_codec import encode_state_pub_inputs_evm

        for pub, proof, res in zip(pubs, proofs, results):
            if res.ok:
                self.pending.append(
                    (
                        proof.encode(),
                        encode_state_pub_inputs_evm(pub),
                        PROVING_SYSTEM_MINA,
                    )
                )
        return results

    def submit_accounts(
        self,
        pubs: list[pm.MinaAccountPubInputs],
        proofs: list[pm.MinaAccountProof],
    ) -> list["vs.StateVerificationResult"]:
        """Batched Proof-of-Account submission: leaf hashes and Merkle
        folds run as per-shape device batches (verify_accounts_batch)."""
        results = vs.verify_accounts_batch(pubs, proofs)
        from .sol_codec import encode_account_pub_inputs_evm

        for pub, proof, res in zip(pubs, proofs, results):
            if res.ok:
                self.pending.append(
                    (
                        proof.encode(),
                        encode_account_pub_inputs_evm(pub),
                        PROVING_SYSTEM_MINA_ACCOUNT,
                    )
                )
        return results

    def submit_state(
        self,
        pub: pm.MinaStatePubInputs,
        proof: pm.MinaStateProof,
        tip_proof_host,
        rand_weights=None,
    ) -> None:
        """Single-proof submission: a batch of one on the batched path."""
        [result] = self.submit_states([pub], [proof], [tip_proof_host], rand_weights)
        if not result.ok:
            raise ValueError(f"state proof rejected: {result.reason}")

    def submit_account(
        self, pub: pm.MinaAccountPubInputs, proof: pm.MinaAccountProof
    ) -> None:
        """Single-proof submission: a batch of one on the batched path."""
        [result] = self.submit_accounts([pub], [proof])
        if not result.ok:
            raise ValueError(f"account proof rejected: {result.reason}")

    def finalize_batch(self) -> list[AlignedVerificationData]:
        """Close the batch; emit verification data per submitted proof."""
        assert self.pending, "empty batch"
        leaves = [
            leaf_commitment(p, pub, tag) for p, pub, tag in self.pending
        ]
        root, proofs = build_batch_merkle(leaves)
        if self.on_batch_root is not None:
            self.on_batch_root(root)
        out = []
        for i, (p, pub, tag) in enumerate(self.pending):
            out.append(
                AlignedVerificationData(
                    proof_commitment=keccak256(p),
                    pub_input_commitment=keccak256(pub),
                    proving_system_aux_commitment=proving_system_commitment(tag),
                    batch_merkle_root=root,
                    batch_inclusion_proof=proofs[i],
                    index_in_batch=i,
                )
            )
        self.pending = []
        return out
