# gcpde-spark developer entry points (reference parity: Makefile `test`)

.PHONY: help test verify bench oracle install sdist wheel

help:  ## list targets
	@grep -E '^[a-z-]+:.*##' $(MAKEFILE_LIST) | awk -F':.*## ' '{printf "%-10s %s\n", $$1, $$2}'

install:  ## editable install (no deps fetched; assumes pyspark et al. present)
	pip install -e . --no-deps --no-build-isolation

sdist:  ## source distribution into dist/
	python -c "from setuptools.build_meta import build_sdist; print(build_sdist('dist'))"

wheel:  ## wheel into dist/ (bdist_wheel where available, PEP 427 fallback otherwise)
	python scripts/build_wheel.py dist

test:  ## full unit/behavioral suite
	python -m pytest tests/ -x -q

verify:  ## the driver gate: every corpus query vs its DuckDB oracle at sf0.01
	rm -rf /tmp/gcpde_spark_warehouse && python scripts/driver_sim.py

bench:  ## headline bench (SPARK_GRAFT_SF_DIR to change scale)
	python bench.py

oracle:  ## DuckDB side of the bench comparison
	python scripts/duckdb_baseline.py
