// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.20;

/// @title Batch verification registry for the TPU verifier service.
/// @notice Plays the role the AlignedLayerServiceManager plays for the
/// reference bridge (verifyBatchInclusion,
/// reference contract/src/MinaStateSettlementExample.sol:109-118): the
/// operator running the TPU verifier (mina_bridge_tpu verifier service)
/// posts keccak batch Merkle roots here after verifying a proof batch;
/// consumer contracts check membership of (proofCommitment,
/// pubInputCommitment, provingSystemAuxCommitment) leaves.
contract MinaBridgeRegistry {
    address public immutable operator;
    mapping(bytes32 => bool) public batchRoots;

    event BatchPosted(bytes32 indexed root);

    constructor(address _operator) {
        operator = _operator;
    }

    function postBatchRoot(bytes32 root) external {
        require(msg.sender == operator, "not operator");
        batchRoots[root] = true;
        emit BatchPosted(root);
    }

    /// @notice Check that a verified proof is included in a posted batch.
    /// Leaf layout matches mina_bridge_tpu.bridge.aligned.leaf_commitment.
    function verifyBatchInclusion(
        bytes32 proofCommitment,
        bytes32 pubInputCommitment,
        bytes32 provingSystemAuxCommitment,
        bytes calldata merkleProof,
        uint256 indexInBatch,
        bytes32 batchMerkleRoot
    ) public view returns (bool) {
        if (!batchRoots[batchMerkleRoot]) return false;
        bytes32 node = keccak256(
            abi.encodePacked(
                proofCommitment,
                pubInputCommitment,
                provingSystemAuxCommitment
            )
        );
        uint256 idx = indexInBatch;
        for (uint256 off = 0; off + 32 <= merkleProof.length; off += 32) {
            bytes32 sib = bytes32(merkleProof[off:off + 32]);
            if (idx & 1 == 1) {
                node = keccak256(abi.encodePacked(sib, node));
            } else {
                node = keccak256(abi.encodePacked(node, sib));
            }
            idx >>= 1;
        }
        return node == batchMerkleRoot;
    }
}
