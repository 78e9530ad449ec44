# Test/bench targets (parity with the reference Makefile's tiers,
# /root/reference/Makefile:71-123)

PY ?= python

.PHONY: test test-fast test-single-chunk test-e2e-batch test-e2e-bundle \
        bench clippy fmt

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/test_babybear.py tests/test_types_base.py \
	  tests/test_chunk_types.py tests/test_batch_types.py \
	  tests/test_e2e_chain.py tests/test_vm.py -q

test-single-chunk:
	RUN_HEAVY=1 $(PY) -m pytest \
	  tests/test_integration_harness.py::test_proved_e2e_chain -q

test-e2e-batch:
	$(PY) -m pytest tests/test_e2e_chain.py -q

test-e2e-bundle:
	RUN_HEAVY=1 $(PY) -m pytest tests/test_integration_harness.py -q

test-heavy:
	RUN_HEAVY=1 $(PY) -m pytest tests/test_integration_harness.py \
	  tests/test_recursion_aggregation.py tests/test_msm.py \
	  tests/test_prover_aggregation.py -q

# round-4 subsystems
test-snark:
	$(PY) -m pytest tests/test_snark_wrapper.py -q

test-execution:
	$(PY) -m pytest tests/test_execution.py -q

test-chips:
	$(PY) -m pytest tests/test_keccak_air.py tests/test_sha256_air.py \
	  tests/test_bigint_air.py -q

bench:
	$(PY) bench.py

chunk-benchmark:
	$(PY) -m zkvm_prover_tpu.bin.chunk_benchmark --cpu --fast

release-assets:
	$(PY) -m zkvm_prover_tpu.bin.build_guest --with-evm-verifier
