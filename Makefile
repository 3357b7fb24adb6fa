# Developer entry points. `make test` mirrors the CI/driver invocation.
.PHONY: test test-fast bench micro scaling eval native install

# Test budget (measured round 3, 2-core CPU rig): cold JAX compile cache
# 6:51 for the full 124-test suite, ~4:30 warm — under the 8-minute budget,
# so the full suite stays the default gate; `test-fast` skips the 2
# slow-marked integration tests when iterating.
test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

# Per-kernel device-time receipts (TPU) -> MICRO_r03.json
micro:
	python benchmarks/micro.py --out MICRO_r03.json

# Dist-BA scaling curve on the 8-virtual-device CPU mesh -> SCALING_r03.json
scaling:
	python benchmarks/scaling.py --out SCALING_r03.json

# Full staged evaluation (BASELINE configs 0-7) -> RESULTS_r03.json + RESULTS.md
eval:
	python eval.py --round 3

native:
	$(MAKE) -C native

install:
	pip install -e .
