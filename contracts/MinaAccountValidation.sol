// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.20;

import {MinaBridgeRegistry} from "./MinaBridgeRegistry.sol";

/// @title Mina account validation (reference
/// MinaAccountValidationExample.sol:10-165): check that a Mina Proof of
/// Account was batch-verified, and expose the Solidity mirror of the Mina
/// account for consumers to decode from the public input.
contract MinaAccountValidation {
    bytes32 public constant PROVING_SYSTEM_ID_COMM =
        keccak256("mina_bridge_tpu:ProvingSystemId:MinaAccount");

    MinaBridgeRegistry public immutable registry;

    constructor(address _registry) {
        registry = MinaBridgeRegistry(_registry);
    }

    struct AlignedArgs {
        bytes32 proofCommitment;
        bytes32 provingSystemAuxCommitment;
        bytes32 batchMerkleRoot;
        bytes merkleProof;
        uint256 verificationDataBatchIndex;
        bytes pubInput;
    }

    /// @notice pubInput = ledgerHash word || encoded account words.
    function validateAccount(
        bytes32 proofCommitment,
        bytes32 provingSystemAuxCommitment,
        bytes32 batchMerkleRoot,
        bytes calldata merkleProof,
        uint256 verificationDataBatchIndex,
        bytes calldata pubInput
    ) external view returns (bool) {
        require(
            provingSystemAuxCommitment == PROVING_SYSTEM_ID_COMM,
            "wrong proving system"
        );
        return
            registry.verifyBatchInclusion(
                proofCommitment,
                keccak256(pubInput),
                provingSystemAuxCommitment,
                merkleProof,
                verificationDataBatchIndex,
                batchMerkleRoot
            );
    }

    /// @notice Decode the account mirror from pubInput[32:] (reference
    /// validateAccountAndReturn, sol:51-74).
    function decodeAccount(bytes calldata pubInput)
        external
        pure
        returns (Account memory acc)
    {
        // flat static word layout: see sol_codec.encode_account_sol
        uint256 o = 32;
        acc.publicKey.x = uint256(bytes32(pubInput[o:o += 32]));
        acc.publicKey.isOdd = uint256(bytes32(pubInput[o:o += 32])) == 1;
        acc.tokenId = bytes32(pubInput[o:o += 32]);
        acc.tokenSymbol = bytes32(pubInput[o:o += 32]);
        acc.balance = uint256(bytes32(pubInput[o:o += 32]));
        acc.nonce = uint256(bytes32(pubInput[o:o += 32]));
        acc.receiptChainHash = bytes32(pubInput[o:o += 32]);
        acc.hasDelegate = uint256(bytes32(pubInput[o:o += 32])) == 1;
        acc.delegate.x = uint256(bytes32(pubInput[o:o += 32]));
        acc.delegate.isOdd = uint256(bytes32(pubInput[o:o += 32])) == 1;
        acc.votingFor = bytes32(pubInput[o:o += 32]);
        acc.timing.isTimed = uint256(bytes32(pubInput[o:o += 32])) == 1;
        acc.timing.initialMinimumBalance = uint256(bytes32(pubInput[o:o += 32]));
        acc.timing.cliffTime = uint256(bytes32(pubInput[o:o += 32]));
        acc.timing.cliffAmount = uint256(bytes32(pubInput[o:o += 32]));
        acc.timing.vestingPeriod = uint256(bytes32(pubInput[o:o += 32]));
        acc.timing.vestingIncrement = uint256(bytes32(pubInput[o:o += 32]));
        uint256[14] memory perms;
        for (uint256 i = 0; i < 14; i++) {
            perms[i] = uint256(bytes32(pubInput[o:o += 32]));
        }
        acc.permissions = perms;
        acc.hasZkapp = uint256(bytes32(pubInput[o:o += 32])) == 1;
        if (acc.hasZkapp) {
            for (uint256 i = 0; i < 8; i++) {
                acc.zkapp.appState[i] = bytes32(pubInput[o:o += 32]);
            }
            acc.zkapp.verificationKeyHash = bytes32(pubInput[o:o += 32]);
        }
    }

    struct CompressedECPoint {
        uint256 x;
        bool isOdd;
    }

    struct Timing {
        bool isTimed;
        uint256 initialMinimumBalance;
        uint256 cliffTime;
        uint256 cliffAmount;
        uint256 vestingPeriod;
        uint256 vestingIncrement;
    }

    struct ZkappAccount {
        bytes32[8] appState;
        bytes32 verificationKeyHash;
    }

    struct Account {
        CompressedECPoint publicKey;
        bytes32 tokenId;
        bytes32 tokenSymbol;
        uint256 balance;
        uint256 nonce;
        bytes32 receiptChainHash;
        bool hasDelegate;
        CompressedECPoint delegate;
        bytes32 votingFor;
        Timing timing;
        uint256[14] permissions;
        bool hasZkapp;
        ZkappAccount zkapp;
    }
}
