# Developer entry points. `make test` mirrors the CI/driver invocation.
.PHONY: test test-fast bench native install

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

native:
	$(MAKE) -C native

install:
	pip install -e .
