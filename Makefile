.PHONY: test test-fast bench bench-smoke verify dryrun native clean

test:
	python -m pytest tests/ -x -q

test-fast:  ## unit tests only (skip CLI e2e; ~7.5 min warm XLA cache, ~15-25 min cold)
	python -m pytest tests/ -x -q --ignore=tests/test_trainer_e2e.py --ignore=tests/test_full_pipeline.py --ignore=tests/test_reproduce_paper.py

bench:
	python bench.py

bench-smoke:  ## bench contract check on tiny shapes (no full compile)
	ARP_BENCH_SMOKE=1 python bench.py

dryrun:  ## multichip dry run (self-provisions a virtual 8-device CPU mesh)
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

verify: dryrun bench-smoke test-fast  ## quick end-to-end health check

native:
	sh arp_tpu/native/build.sh

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; rm -rf .pytest_cache
