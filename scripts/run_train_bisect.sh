#!/bin/bash
# Train-step bisect on the tunneled TPU: encoder-only, cached (policy-only),
# and the full fp32 flagship step with XLA cost analysis.
# Rides out tunnel dark windows with a bounded out-of-process backend probe
# (init failures are cached per-process — the retry must be a fresh python).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

probe() {
  for i in $(seq 1 20); do
    if timeout -k 30 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
      return 0
    fi
    echo "[probe] backend unavailable (attempt $i), sleeping 60s" >&2
    sleep 60
  done
  echo "[probe] giving up" >&2
  return 1
}

cd /root/repo
probe || exit 1
echo "=== encoder-only (fp32 + bf16, scan-amortized) ==="
timeout -k 60 3600 python -u scripts/bench_train.py --variant encoder --batch 64 --steps 16
probe || exit 1
echo "=== cached (policy-only step) ==="
timeout -k 60 3600 python -u scripts/bench_train.py --variant cached --analyze
probe || exit 1
echo "=== full fp32 flagship step ==="
timeout -k 60 3600 python -u scripts/bench_train.py --variant fp32 --analyze
