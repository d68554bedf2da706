"""Shared subprocess environment for CLI e2e tests (with persistent XLA cache)."""

import os


def make_cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = "/root/repo"
    # persistent compilation cache: repeated subprocess runs of the same tiny
    # programs skip recompilation entirely
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
    return env
