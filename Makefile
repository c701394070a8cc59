# Mirror of the reference Makefile targets (reference Makefile:1-31)

.PHONY: test bench submit_devnet_state submit_mainnet_state submit_account \
        deploy_example_bridge_contracts execute_example gen_contract_abis

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

submit_devnet_state:
	python -m mina_bridge_tpu.cli submit-state --devnet

submit_mainnet_state:
	python -m mina_bridge_tpu.cli submit-state

submit_account:
	python -m mina_bridge_tpu.cli submit-account $(PUBLIC_KEY) $(STATE_HASH)

deploy_example_bridge_contracts:
	python -m mina_bridge_tpu.contract_deployer

# Requires foundry (not vendored): builds contracts/ and copies artifacts
gen_contract_abis:
	forge build --root contracts && \
	cp contracts/out/*/MinaBridgeRegistry.json contracts/abi/ && \
	cp contracts/out/*/MinaStateSettlement.json contracts/abi/ && \
	cp contracts/out/*/MinaAccountValidation.json contracts/abi/

execute_example:
	python example/app.py validate-solution $(ZKAPP_PUBLIC_KEY)
