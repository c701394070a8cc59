"""End-to-end Sudoku example (reference `make execute_example`, SURVEY §3.4):
zkApp circuit proof -> account state -> bridge -> Ethereum consumer."""

import random
import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "example"))

import sudoku_lib
from sudoku_zkapp import LOG_N, SudokuCircuit, SudokuZkApp, puzzle_hash

from mina_bridge_tpu.bridge import fixtures, mina_types as mt, proof_model as pm
from mina_bridge_tpu.bridge.keccak import keccak256
from mina_bridge_tpu.fields.params import FP


@pytest.fixture(scope="module")
def sudoku_world():
    rng = random.Random(0x5D0)
    puzzle, solution = sudoku_lib.generate(rng, holes=30)
    zkapp = SudokuZkApp(puzzle)
    zkapp.submit_solution(solution)
    assert zkapp.is_solved == 1
    return rng, puzzle, solution, zkapp


def test_zkapp_state_transitions(sudoku_world):
    rng, puzzle, solution, zkapp = sudoku_world
    assert zkapp.app_state()[0] == puzzle_hash(puzzle)
    assert zkapp.app_state()[1] == 1
    bad = [row[:] for row in solution]
    bad[3][3] = bad[3][4]
    fresh = SudokuZkApp(puzzle)
    with pytest.raises(ValueError):
        fresh.submit_solution(bad)
    assert fresh.is_solved == 0


def test_sudoku_account_to_eth_flow(sudoku_world):
    """zkApp account with solved state flows through account verification
    and the SudokuValidity consumer logic."""
    rng, puzzle, solution, zkapp = sudoku_world
    from mina_bridge_tpu.bridge import verifier_service as vs
    from mina_bridge_tpu.bridge.sol_codec import encode_account_sol

    account = fixtures.make_account(rng, with_zkapp=True)
    account["zkapp"]["app_state"] = [x % FP.p for x in zkapp.app_state()]
    acc_bytes = mt.ACCOUNT.encode(account)
    leaf = pm.host_account_hash(account)
    ledger = fixtures.SparseLedger()
    ledger.set_leaf(7, leaf)
    pub = pm.MinaAccountPubInputs(
        ledger_hash=ledger.root(),
        encoded_account=encode_account_sol(account),
    )
    proof = pm.MinaAccountProof(merkle_path=ledger.path(7), account=acc_bytes)
    res = vs.verify_proof_of_account(pub, proof)
    assert res.ok, res.reason

    # SudokuValidity consumer checks (python model of the contract)
    vk_hash = pm.vk_hash(account["zkapp"]["verification_key"])
    app_state1 = account["zkapp"]["app_state"][1]
    assert app_state1 != 0  # isSolved
    assert vk_hash == pm.vk_hash(account["zkapp"]["verification_key"])


def test_sudoku_circuit_prove_host_verify(sudoku_world):
    """Full kimchi-style proof of the 1204-row sudoku circuit (host)."""
    rng, puzzle, solution, zkapp = sudoku_world
    from mina_bridge_tpu.curves.srs import srs_points_host
    from mina_bridge_tpu.kimchi import prover_host

    circ = SudokuCircuit(puzzle)
    g, h = srs_points_host("pallas", circ.circuit.n)
    index, proof = circ.prove(solution, g, h, rng)
    assert prover_host.host_verify(index, proof, g, h)
    # tampered public input (wrong puzzle hash) fails
    import dataclasses

    bad = dataclasses.replace(
        proof, public=[(proof.public[0] + 1) % FP.p, proof.public[1]]
    )
    assert not prover_host.host_verify(index, bad, g, h)
