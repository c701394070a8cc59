"""Config, env, CLI plumbing, proof persistence (SURVEY §5 aux subsystems)."""

import os

import pytest

from mina_bridge_tpu.bridge import aligned as al
from mina_bridge_tpu.utils import constants
from mina_bridge_tpu.utils.env import EnvironmentVariables, load_dotenv
from mina_bridge_tpu.utils.retry import with_retry


def test_env_defaults(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    for k in list(os.environ):
        if k.startswith(("MINA_", "ETH_", "PRIVATE_", "STATE_", "ACCOUNT_", "SAVE_", "PROOF_")):
            monkeypatch.delenv(k, raising=False)
    env = EnvironmentVariables.new()
    assert env.chain_id == constants.ANVIL_CHAIN_ID
    assert env.private_key == constants.ANVIL_PRIVATE_KEY
    assert not env.save_proof


def test_dotenv_loading(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("ETH_CHAIN_ID", raising=False)
    (tmp_path / ".env").write_text("ETH_CHAIN_ID=17000\n# comment\nBAD LINE\n")
    load_dotenv()
    assert os.environ["ETH_CHAIN_ID"] == "17000"
    monkeypatch.delenv("ETH_CHAIN_ID", raising=False)


def test_save_proof_files(tmp_path):
    al.save_proof_files(str(tmp_path), "mina_state", b"proofdata", b"pubdata")
    assert (tmp_path / "mina_state.proof").read_bytes() == b"proofdata"
    assert (tmp_path / "mina_state.pub").read_bytes() == b"pubdata"


def test_retry_budget():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retry(flaky, attempts=5, base_delay=0.0) == "ok"
    assert len(calls) == 3
    with pytest.raises(RuntimeError):
        with_retry(lambda: (_ for _ in ()).throw(RuntimeError("x")), attempts=2, base_delay=0.0)


def test_cli_help():
    from mina_bridge_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])


def test_deployer_missing_artifacts():
    from mina_bridge_tpu.contract_deployer import load_bytecode

    with pytest.raises(FileNotFoundError):
        load_bytecode("MinaBridgeRegistry")
