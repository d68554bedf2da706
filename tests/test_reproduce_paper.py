"""scripts/reproduce_paper.py --smoke: the paper-table orchestration end-to-end.

The smoke path runs the REAL pipeline CLIs (collect -> label -> train -> eval)
for one paper task on the CPU backend and must emit the results table the full
run would (reference README.md:36-43 benchmark matrix).
"""

import json
import os
import subprocess
import sys

from tests.cli_env import make_cli_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_reproduce_paper_smoke(tmp_path):
    out = tmp_path / "paper"
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "reproduce_paper.py"),
            "--smoke", "--tasks", "coinrun", "--seeds", "0", "--output", str(out),
        ],
        env=make_cli_env(),
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])

    results = json.loads((out / "results.json").read_text())
    res = results["coinrun"]
    assert res["train"] == "coinrun/none" and res["test"] == "coinrun/aisc"
    metrics = res["seeds"]["0"]
    assert "return" in metrics and "success_rate" in metrics, metrics
    assert 0.0 <= res["success_rate_mean"] <= 1.0
    # the markdown table is the user-facing artifact
    assert "| coinrun | coinrun/none | coinrun/aisc |" in proc.stdout
