"""bench.py contract: prints exactly one JSON line with the required keys."""

import json
import os
import subprocess
import sys


def test_bench_smoke():
    from tests.cli_env import make_cli_env

    env = make_cli_env()
    env["ARP_BENCH_SMOKE"] = "1"
    proc = subprocess.run(
        [sys.executable, "/root/repo/bench.py"], env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, lines
    record = json.loads(lines[0])
    assert set(record) == {"metric", "value", "unit", "vs_baseline"}
    assert record["value"] > 0
