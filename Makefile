.PHONY: test test-fast bench native clean

test:
	python -m pytest tests/ -x -q

test-fast:  ## unit tests only (skip subprocess CLI e2e, ~2 min)
	python -m pytest tests/ -x -q --ignore=tests/test_trainer_e2e.py --ignore=tests/test_full_pipeline.py

bench:
	python bench.py

native:
	sh arp_tpu/native/build.sh

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; rm -rf .pytest_cache
