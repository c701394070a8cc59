// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.20;

import {MinaBridgeRegistry} from "./MinaBridgeRegistry.sol";

/// @title Mina state settlement: stores the bridged transition frontier.
/// @notice Same storage/flow as the reference's
/// MinaStateSettlementExample.sol:15-151 — 16 verified state hashes and
/// 16 ledger hashes, updated when a Mina Proof of State has been batch-
/// verified (here by the TPU verifier service via MinaBridgeRegistry).
contract MinaStateSettlement {
    uint256 public constant BRIDGE_TRANSITION_FRONTIER_LEN = 16;

    /// keccak of the proving-system tag (reference sol:17-18).
    bytes32 public constant PROVING_SYSTEM_ID_COMM =
        keccak256("mina_bridge_tpu:ProvingSystemId:Mina");

    MinaBridgeRegistry public immutable registry;
    bool public immutable isDevnet;

    bytes32[BRIDGE_TRANSITION_FRONTIER_LEN] private chainStateHashes;
    bytes32[BRIDGE_TRANSITION_FRONTIER_LEN] private chainLedgerHashes;

    event ChainUpdated(bytes32 indexed newTip);

    constructor(bytes32 rootStateHash, bool _isDevnet, address _registry) {
        registry = MinaBridgeRegistry(_registry);
        isDevnet = _isDevnet;
        chainStateHashes[BRIDGE_TRANSITION_FRONTIER_LEN - 1] = rootStateHash;
    }

    function getTipStateHash() external view returns (bytes32) {
        return chainStateHashes[BRIDGE_TRANSITION_FRONTIER_LEN - 1];
    }

    function getTipLedgerHash() external view returns (bytes32) {
        return chainLedgerHashes[BRIDGE_TRANSITION_FRONTIER_LEN - 1];
    }

    function getChainStateHashes()
        external
        view
        returns (bytes32[] memory out)
    {
        out = new bytes32[](BRIDGE_TRANSITION_FRONTIER_LEN);
        for (uint256 i = 0; i < BRIDGE_TRANSITION_FRONTIER_LEN; i++) {
            out[i] = chainStateHashes[i];
        }
    }

    function getChainLedgerHashes()
        external
        view
        returns (bytes32[] memory out)
    {
        out = new bytes32[](BRIDGE_TRANSITION_FRONTIER_LEN);
        for (uint256 i = 0; i < BRIDGE_TRANSITION_FRONTIER_LEN; i++) {
            out[i] = chainLedgerHashes[i];
        }
    }

    /// @notice True iff the ledger hash is one of the bridged ledgers
    /// (reference sol:66-76).
    function isLedgerVerified(bytes32 ledgerHash) external view returns (bool) {
        for (uint256 i = 0; i < BRIDGE_TRANSITION_FRONTIER_LEN; i++) {
            if (chainLedgerHashes[i] == ledgerHash) return true;
        }
        return false;
    }

    /// @notice Update the bridged chain after batch verification.
    /// pubInput layout (sol_codec.encode_state_pub_inputs_evm):
    ///   word 0: bridge tip state hash (must match current tip, sol:98-105)
    ///   words 1..16: candidate state hashes
    ///   words 17..32: candidate ledger hashes
    function updateChain(
        bytes32 proofCommitment,
        bytes32 provingSystemAuxCommitment,
        bytes32 batchMerkleRoot,
        bytes calldata merkleProof,
        uint256 verificationDataBatchIndex,
        bytes calldata pubInput
    ) external {
        require(
            provingSystemAuxCommitment == PROVING_SYSTEM_ID_COMM,
            "wrong proving system"
        );
        require(pubInput.length == 33 * 32, "bad pubInput length");
        bytes32 claimedTip = bytes32(pubInput[0:32]);
        require(
            claimedTip == chainStateHashes[BRIDGE_TRANSITION_FRONTIER_LEN - 1],
            "tip mismatch: chain not linked to bridged tip"
        );
        require(
            registry.verifyBatchInclusion(
                proofCommitment,
                keccak256(pubInput),
                provingSystemAuxCommitment,
                merkleProof,
                verificationDataBatchIndex,
                batchMerkleRoot
            ),
            "batch inclusion check failed"
        );
        // store both arrays from calldata (reference Yul loop sol:122-146)
        for (uint256 i = 0; i < BRIDGE_TRANSITION_FRONTIER_LEN; i++) {
            chainStateHashes[i] = bytes32(
                pubInput[32 * (1 + i):32 * (2 + i)]
            );
            chainLedgerHashes[i] = bytes32(
                pubInput[32 * (17 + i):32 * (18 + i)]
            );
        }
        emit ChainUpdated(
            chainStateHashes[BRIDGE_TRANSITION_FRONTIER_LEN - 1]
        );
    }
}
