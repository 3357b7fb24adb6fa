# Developer entry points. `make test` mirrors the CI/driver invocation.
.PHONY: test test-fast bench micro scaling eval readme native install

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

# Per-kernel device-time receipts (TPU) -> MICRO_r04.json
micro:
	python benchmarks/micro.py --out MICRO_r04.json

# Dist-BA scaling curve + compute/comm breakdown (8-virtual-device CPU mesh)
scaling:
	python benchmarks/scaling.py --out SCALING_r04.json

# Full staged evaluation (BASELINE configs 0-10) -> RESULTS_r04.json + RESULTS.md
eval:
	python eval.py --round 4

# Regenerate README's Performance section from the latest artifacts
readme:
	python scripts/sync_readme.py

native:
	$(MAKE) -C native

install:
	pip install -e .
