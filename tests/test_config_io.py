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
    assert env.private_key is None  # no PRIVATE_KEY set
    assert env.wallet().private_key == constants.ANVIL_PRIVATE_KEY
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


def test_keystore_roundtrip(tmp_path):
    """V3 keystore encrypt/decrypt (scrypt + pbkdf2), bad-password MAC
    rejection, and the wallet selection policy (wallet.rs:24-64)."""
    import pytest

    from mina_bridge_tpu.bridge import keystore as ks

    key = 0x1234_5678_9ABC_DEF0_1234_5678_9ABC_DEF0
    for kdf in ("scrypt", "pbkdf2"):
        path = tmp_path / f"ks_{kdf}.json"
        ks.encrypt_keystore(key, "hunter2", path, kdf=kdf, work=1 << 10)
        assert ks.decrypt_keystore(path, "hunter2") == key
        with pytest.raises(ValueError, match="MAC"):
            ks.decrypt_keystore(path, "wrong")
    # selection policy
    with pytest.raises(ValueError, match="Choose only one"):
        ks.get_wallet("holesky", keystore_path=str(path), private_key="0x1")
    with pytest.raises(ValueError, match="KEYSTORE_PATH or PRIVATE_KEY"):
        ks.get_wallet("holesky")
    w = ks.get_wallet(
        "holesky", keystore_path=str(path), password_prompt=lambda: "hunter2"
    )
    assert w.private_key == key
    assert ks.get_wallet("holesky", private_key="0xabc").private_key == 0xABC
    from mina_bridge_tpu.utils.constants import ANVIL_PRIVATE_KEY

    assert ks.get_wallet("devnet").private_key == ANVIL_PRIVATE_KEY
