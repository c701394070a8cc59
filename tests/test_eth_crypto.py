"""Known-answer tests for the from-scratch Ethereum crypto stack."""

from mina_bridge_tpu.bridge import rlp, secp256k1
from mina_bridge_tpu.bridge.keccak import keccak256
from mina_bridge_tpu.utils.constants import ANVIL_PRIVATE_KEY


def test_anvil_address():
    # Anvil/Hardhat's famous account #0
    assert (
        secp256k1.address(ANVIL_PRIVATE_KEY).hex()
        == "f39fd6e51aad88f6f4ce6ab8827279cfffb92266"
    )


def test_sign_verify_roundtrip():
    priv = 0xC0FFEE
    pub = secp256k1.pubkey(priv)
    h = keccak256(b"mina bridge tpu")
    v, r, s = secp256k1.sign(priv, h)
    assert v in (0, 1)
    assert s <= secp256k1.N // 2  # low-s
    assert secp256k1.verify(pub, h, r, s)
    assert not secp256k1.verify(pub, keccak256(b"other"), r, s)
    # determinism (RFC 6979)
    assert secp256k1.sign(priv, h) == (v, r, s)


def test_eip1559_roundtrip():
    fields = rlp.eip1559_tx_fields(
        31337, 7, 10**9, 10**9, 21000, b"\x11" * 20, 0, b"\xde\xad"
    )
    raw = rlp.eip1559_serialize(fields, 1, 123456789, 987654321)
    assert raw[0] == 0x02
    decoded = rlp.rlp_decode(raw[1:])
    assert decoded[1] == b"\x07"  # nonce
    assert decoded[5] == b"\x11" * 20
    assert decoded[7] == b"\xde\xad"
    assert int.from_bytes(decoded[10], "big") == 123456789


def test_metrics():
    from mina_bridge_tpu.utils.profiling import Metrics

    m = Metrics()
    with m.timer("phase"):
        m.count("proofs", 3)
    assert m.report()["proofs"] == 3
    assert m.rate("proofs", "phase") > 0
