"""Test configuration: run everything on a virtual 8-device CPU mesh.

jax may already be imported by the interpreter startup (sitecustomize), so
env vars alone are too late; override via jax.config before any backend is
initialized.  XLA_FLAGS is still read at backend-init time, so setting it
here works as long as no jax computation ran yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache for the IN-PROCESS suite too (the subprocess
# CLI tests already share it via cli_env.make_cli_env): a warm cache cuts the
# suite's wall time by the full compile budget.  Same default dir as cli_env.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual devices"
