"""The Proof-of-State / Proof-of-Account verifier service (TPU-backed).

TPU-native replacement for the Aligned operators' Mina verifiers
(reference README.md:275-362; aligned fork `operator/mina/` and
`operator/mina_account/`, SURVEY §2b). Verification steps:

Proof of State (README.md:281-313):
 1. public-input checks — recompute every state hash and ledger hash
    (batched device Poseidon over all 16+1 states at once) and the
    root->tip chain linkage;
 2. Ouroboros Samasika consensus checks candidate-tip vs bridge-tip
    (bridge/consensus.py);
 3. tip proof verification (the Pickles stand-in: batched kimchi-style
    verifier, kimchi/verifier.py) with the tip state hash as public
    input.

Proof of Account (README.md:358-362):
 1. account hash (device Poseidon) -> Merkle fold along the 35-deep path
    (bridge/merkle.py, batched) -> root == ledger hash;
 2. re-encoded account consistency against the pub-input encoding.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..fields.params import NLIMBS, int_to_limbs, limbs_to_int
from ..kimchi import verifier as kv
from ..pickles import verifier as pickles
from . import mina_types as mt
from . import proof_model as pm
from .consensus import candidate_wins
from .merkle import device_merkle_roots
from .sol_codec import encode_account_sol
from .state_hash import (
    PREFIX_ACCOUNT,
    PREFIX_PROTO_STATE_BODY,
    device_hash_with_prefix,
    device_state_hashes,
)


def _to_limbs_arr(vals: list[int]) -> jnp.ndarray:
    return jnp.asarray(np.stack([int_to_limbs(v, NLIMBS) for v in vals]))


def system_rand_weights(batch: int) -> jnp.ndarray:
    """(B, 5, NLIMBS) verifier randomness from OS entropy.

    The batch-RLC and hint-binding soundness arguments (PARITY D11)
    assume weights unpredictable to the prover and sampled AFTER the
    proofs are fixed, so the serving path (TpuVerifierService) calls
    this itself on receipt of a batch; explicit rand_weights parameters
    exist only as test seams. Components 0-1 weight the wrap-side
    (Pallas-scalar) opening combine; component 2 is the Vesta-scalar
    legacy accumulator-decider weight; components 3-4 weight the
    step-proof (Vesta-scalar) opening combine (pickles
    batch_verify_tips' on-device step verification, PARITY D7)."""
    import secrets

    from ..curves import PALLAS, VESTA

    rng = secrets.SystemRandom()
    mods = (
        PALLAS.scalar.p,
        PALLAS.scalar.p,
        VESTA.scalar.p,
        VESTA.scalar.p,
        VESTA.scalar.p,
    )
    return jnp.asarray(
        np.array(
            [
                [int_to_limbs(rng.randrange(m), NLIMBS) for m in mods]
                for _ in range(batch)
            ],
            np.int32,
        )
    )


@dataclasses.dataclass
class StateVerificationResult:
    ok: bool
    reason: str = ""


def verify_proof_of_state(
    pub: pm.MinaStatePubInputs,
    proof: pm.MinaStateProof,
    block_log_n: int,
    tip_proof_device: "pickles.DeviceTips",
    rand_weights,
    **kw,
) -> StateVerificationResult:
    """Single-proof Proof-of-State: a batch of one on the batched path
    (verify_states_batch), so the pub-input / linkage / consensus / tip
    checks exist exactly once."""
    [result] = verify_states_batch(
        [pub], [proof], block_log_n, tip_proof_device, rand_weights, **kw
    )
    return result


def _pad_batch(proofs, rw, min_batch: int = 2):
    """Pad a proof batch (any pytree whose leaves lead with B) to the
    next power of two >= min_batch by duplication: keeps the verify graph
    at a handful of canonical compiled shapes (compile-cache friendly).
    Duplicating a proof never changes the batch verdict: a duplicate of a
    valid proof verifies, a duplicate of an invalid one fails alongside
    the original."""
    import jax

    B = rw.shape[0]
    target = max(min_batch, 1 << (B - 1).bit_length())
    if B == target:
        return proofs, rw
    reps = -(-target // B)

    def tile(x):
        return jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:target]

    return jax.tree.map(tile, proofs), tile(rw)


def _tip_verdicts(
    idxs: list[int],
    tip_proofs_device: "pickles.DeviceTips",
    rand_weights,
    block_log_n: int,
    step_log_n: int | None = None,
    dindex=None,
    step_dindex=None,
) -> dict[int, bool]:
    """Per-proof tip verdicts for the given batch indices.

    Verifies the whole index set in ONE batched device call (single MSM);
    only on failure does it bisect, so the honest path costs exactly one
    dispatch and a batch with k bad proofs costs O(k log B) dispatches.
    Every subset is padded to a power-of-two batch by duplication, so
    bisection reuses a handful of canonical compiled shapes. This keeps
    per-proof isolation (reference bar: Aligned operators verify each
    batch entry independently, README.md:213-215) without giving up the
    batched-MSM serving path."""
    import jax

    verdicts: dict[int, bool] = {}

    def rec(sub: list[int]):
        if not sub:
            return
        sel = jnp.asarray(np.array(sub, np.int32))
        tp = jax.tree.map(lambda x: x[sel], tip_proofs_device)
        rw = rand_weights[sel]
        tp, rw = _pad_batch(tp, rw)
        if bool(
            pickles.batch_verify_tips(
                tp, rw, log_n=block_log_n, step_log_n=step_log_n,
                dindex=dindex, step_dindex=step_dindex,
            )
        ):
            for i in sub:
                verdicts[i] = True
        elif len(sub) == 1:
            verdicts[sub[0]] = False
        else:
            mid = len(sub) // 2
            rec(sub[:mid])
            rec(sub[mid:])

    rec(list(idxs))
    return verdicts


def verify_proof_of_account(
    pub: pm.MinaAccountPubInputs, proof: pm.MinaAccountProof
) -> StateVerificationResult:
    account = mt.ACCOUNT.decode(proof.account)
    # encoded account consistency (Solidity ABI encoding)
    if encode_account_sol(account) != pub.encoded_account:
        return StateVerificationResult(False, "encoded account mismatch")

    fields = pm.account_fields(account)
    af = jnp.asarray(np.stack([int_to_limbs(v, NLIMBS) for v in fields]))[None]
    leaf = device_hash_with_prefix(PREFIX_ACCOUNT, af)  # (1, NLIMBS)

    path = proof.merkle_path
    sibs = _to_limbs_arr([node[1][0] for node in path])[None]
    is_left = jnp.asarray(
        np.array([[1 if node[0] == "Left" else 0 for node in path]], np.int32)
    )
    root = device_merkle_roots(leaf, sibs, is_left)
    if limbs_to_int(np.asarray(root[0])) != pub.ledger_hash:
        return StateVerificationResult(False, "merkle root != ledger hash")
    return StateVerificationResult(True)


def verify_accounts_batch(
    pubs: list[pm.MinaAccountPubInputs], proofs: list[pm.MinaAccountProof]
) -> list[StateVerificationResult]:
    """Batched account verification: all leaf hashes and Merkle folds run
    as one device batch (the bridge's account-throughput hot path)."""
    accounts = [mt.ACCOUNT.decode(p.account) for p in proofs]
    results = [StateVerificationResult(True) for _ in proofs]
    for i, (a, pub) in enumerate(zip(accounts, pubs)):
        if encode_account_sol(a) != pub.encoded_account:
            results[i] = StateVerificationResult(False, "encoded account mismatch")
    fields = [pm.account_fields(a) for a in accounts]
    # An account's Poseidon leaf hash must not depend on what it is
    # batched with: the sponge absorbs exactly len(fields) elements, so
    # zero-padding shorter accounts to a batch-wide max would change
    # their hash vs the single-proof path. Group by (field count, merkle
    # depth) and run one device batch per group — each group's program
    # is the same compiled shape the single path uses.
    groups: dict[tuple[int, int], list[int]] = {}
    for i, (f, p) in enumerate(zip(fields, proofs)):
        groups.setdefault((len(f), len(p.merkle_path)), []).append(i)
    for idxs in groups.values():
        af = jnp.asarray(
            np.stack(
                [
                    np.stack([int_to_limbs(v, NLIMBS) for v in fields[i]])
                    for i in idxs
                ]
            )
        )
        leaves = device_hash_with_prefix(PREFIX_ACCOUNT, af)
        sibs = jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            int_to_limbs(nd[1][0], NLIMBS)
                            for nd in proofs[i].merkle_path
                        ]
                    )
                    for i in idxs
                ]
            )
        )
        is_left = jnp.asarray(
            np.array(
                [
                    [1 if nd[0] == "Left" else 0 for nd in proofs[i].merkle_path]
                    for i in idxs
                ],
                np.int32,
            )
        )
        roots = device_merkle_roots(leaves, sibs, is_left)
        for i, r in zip(idxs, [limbs_to_int(np.asarray(r)) for r in roots]):
            if results[i].ok and r != pubs[i].ledger_hash:
                results[i] = StateVerificationResult(
                    False, "merkle root != ledger hash"
                )
    return results


def verify_states_batch(
    pubs: list[pm.MinaStatePubInputs],
    proofs: list[pm.MinaStateProof],
    block_log_n: int,
    tip_proofs_device: "pickles.DeviceTips",
    rand_weights,
    step_log_n: int | None = None,
    dindex=None,
    step_dindex=None,
) -> list[StateVerificationResult]:
    """Verify many Proof-of-States at once: all 17*B protocol-state hashes
    run as one device Poseidon batch and all B tip proofs verify in one
    batched kimchi call / single MSM (BASELINE config 5's batch axis; the
    proof-batch dimension is what shards across hosts, SURVEY §2c)."""
    from ..utils.profiling import METRICS

    with METRICS.timer("verify_states_batch"):
        results = _verify_states_batch(
            pubs, proofs, block_log_n, tip_proofs_device, rand_weights,
            step_log_n=step_log_n, dindex=dindex, step_dindex=step_dindex,
        )
    METRICS.count("state_proofs_submitted", len(pubs))
    METRICS.count("state_proofs_verified", sum(r.ok for r in results))
    return results


def _verify_states_batch(
    pubs: list[pm.MinaStatePubInputs],
    proofs: list[pm.MinaStateProof],
    block_log_n: int,
    tip_proofs_device: "pickles.DeviceTips",
    rand_weights,
    step_log_n: int | None = None,
    dindex=None,
    step_dindex=None,
) -> list[StateVerificationResult]:
    B = len(pubs)
    n = pm.BRIDGE_TRANSITION_FRONTIER_LEN
    results = [StateVerificationResult(True) for _ in range(B)]
    decoded = []
    for b, proof in enumerate(proofs):
        if len(proof.candidate_chain_states) != n:
            results[b] = StateVerificationResult(False, "wrong chain length")
            decoded.append(None)
            continue
        try:
            decoded.append(
                (
                    [
                        mt.decode_protocol_state_any(s)
                        for s in proof.candidate_chain_states
                    ],
                    mt.decode_protocol_state_any(proof.bridge_tip_state),
                )
            )
        except Exception as e:  # a malformed blob fails alone, not the batch
            results[b] = StateVerificationResult(False, f"undecodable state: {e}")
            decoded.append(None)

    # batched hashing over every state of every proof. A proof whose
    # decoded states disagree on body field count cannot be stacked into
    # the batch array — fail it alone (against the MODAL count, so one
    # malformed proof never fails the others), never the whole batch.
    from collections import Counter

    per_proof_flens = {
        b: [len(pm.state_body_fields(s)) for s in dec[0] + [dec[1]]]
        for b, dec in enumerate(decoded)
        if dec is not None
    }
    counts = Counter(fl for fls in per_proof_flens.values() for fl in fls)
    if counts:
        flen = counts.most_common(1)[0][0]
        for b, fls in per_proof_flens.items():
            if any(fl != flen for fl in fls):
                results[b] = StateVerificationResult(
                    False, "inconsistent body field count"
                )
                decoded[b] = None
    all_fields, owners = [], []
    for b, dec in enumerate(decoded):
        if dec is None:
            continue
        states, tip = dec
        for s in states + [tip]:
            all_fields.append(pm.state_body_fields(s))
            owners.append(b)
    if all_fields:
        bf = jnp.asarray(
            np.stack(
                [np.stack([int_to_limbs(v, NLIMBS) for v in f]) for f in all_fields]
            )
        )
        body_hashes = device_hash_with_prefix(PREFIX_PROTO_STATE_BODY, bf)
        prevs = _to_limbs_arr(
            [
                s["previous_state_hash"]
                for dec in decoded
                if dec is not None
                for s in dec[0] + [dec[1]]
            ]
        )
        hashes_dev = device_state_hashes(prevs, body_hashes)
        hashes = [limbs_to_int(np.asarray(h)) for h in hashes_dev]

    # per-proof host checks (pub inputs, linkage, consensus)
    cursor = 0
    for b, dec in enumerate(decoded):
        if dec is None:
            continue
        states, tip = dec
        cand = hashes[cursor : cursor + n]
        tip_hash = hashes[cursor + n]
        cursor += n + 1
        pub = pubs[b]
        if cand != pub.candidate_chain_state_hashes:
            results[b] = StateVerificationResult(False, "state hash mismatch")
        elif [
            s["body"]["blockchain_state"]["snarked_ledger_hash"] for s in states
        ] != pub.candidate_chain_ledger_hashes:
            results[b] = StateVerificationResult(False, "ledger hash mismatch")
        elif tip_hash != pub.bridge_tip_state_hash:
            results[b] = StateVerificationResult(False, "bridge tip hash mismatch")
        elif any(
            states[i + 1]["previous_state_hash"] != cand[i] for i in range(n - 1)
        ):
            results[b] = StateVerificationResult(False, "chain broken")
        elif not candidate_wins(
            pm.consensus_from_state(tip, tip_hash),
            pm.consensus_from_state(states[-1], cand[-1]),
        ):
            results[b] = StateVerificationResult(False, "consensus: not better")
        else:
            claimed = limbs_to_int(
                np.asarray(tip_proofs_device.wrap.public)[b, 0]
            )
            if claimed != cand[-1]:
                results[b] = StateVerificationResult(
                    False, "tip proof binds wrong hash"
                )

    # one batched tip verification over the host-ok subset (single MSM
    # on the honest path; bisects only on failure). Proofs that already
    # failed host checks are excluded so one malformed submission can
    # never mask — or fail — another proof's tip verdict.
    ok_idxs = [b for b, r in enumerate(results) if r.ok]
    verdicts = _tip_verdicts(
        ok_idxs, tip_proofs_device, rand_weights, block_log_n,
        step_log_n=step_log_n, dindex=dindex, step_dindex=step_dindex,
    )
    for b in ok_idxs:
        if not verdicts[b]:
            results[b] = StateVerificationResult(False, "tip proof invalid")
    return results
