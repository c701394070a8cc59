// SPDX-License-Identifier: Apache-2.0
pragma solidity ^0.8.20;

import {MinaStateSettlement} from "../../contracts/MinaStateSettlement.sol";
import {MinaAccountValidation} from "../../contracts/MinaAccountValidation.sol";

/// @title Example consumer: accept a Sudoku solution proven on Mina.
/// @notice Parity with the reference example
/// (example/eth_contract/src/SudokuValidity.sol:7-85): the solution is
/// accepted iff (1) the zkApp's snarked ledger is bridged, (2) the zkApp
/// account proof was batch-verified, (3) the account's verification key
/// hash matches the hardcoded Sudoku circuit, (4) appState[1] != 0
/// (isSolved).
contract SudokuValidity {
    MinaStateSettlement public immutable stateSettlement;
    MinaAccountValidation public immutable accountValidation;
    bytes32 public immutable expectedVkHash;
    uint256 public latestSolutionTimestamp;

    constructor(
        address _stateSettlement,
        address _accountValidation,
        bytes32 _expectedVkHash
    ) {
        stateSettlement = MinaStateSettlement(_stateSettlement);
        accountValidation = MinaAccountValidation(_accountValidation);
        expectedVkHash = _expectedVkHash;
    }

    function validateSolution(
        bytes32 proofCommitment,
        bytes32 provingSystemAuxCommitment,
        bytes32 batchMerkleRoot,
        bytes calldata merkleProof,
        uint256 verificationDataBatchIndex,
        bytes calldata pubInput
    ) external {
        bytes32 ledgerHash = bytes32(pubInput[0:32]);
        require(
            stateSettlement.isLedgerVerified(ledgerHash),
            "ledger not bridged"
        );
        require(
            accountValidation.validateAccount(
                proofCommitment,
                provingSystemAuxCommitment,
                batchMerkleRoot,
                merkleProof,
                verificationDataBatchIndex,
                pubInput
            ),
            "account proof invalid"
        );
        MinaAccountValidation.Account memory acc = accountValidation
            .decodeAccount(pubInput);
        require(
            acc.zkapp.verificationKeyHash == expectedVkHash,
            "not the sudoku zkApp"
        );
        require(uint256(acc.zkapp.appState[1]) != 0, "sudoku not solved");
        latestSolutionTimestamp = block.timestamp;
    }
}
