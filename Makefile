# Test on CPU with the axon TPU tunnel bypassed (see tests/conftest.py).
# Sharded across fresh pytest processes: one monolithic process
# reproducibly SIGABRTs from accumulated XLA state (~190 tests in);
# see scripts/run_tests.sh.
test:
	bash scripts/run_tests.sh

test-monolithic:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q -x

bench:
	python bench.py

.PHONY: test test-monolithic test-fast bench
