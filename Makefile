# Test on CPU with the axon TPU tunnel bypassed (see tests/conftest.py).
test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q -x

bench:
	python bench.py

.PHONY: test test-fast bench
