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


def test_full_matrix_flags_are_declared(tmp_path):
    """Every flag in the FULL (non-smoke) command matrix must exist on its
    target CLI.  The full paper run needs real weights/engine and never runs
    in this environment, so a typo'd or renamed flag would otherwise only
    surface on real hardware (reference analogue: jobs/train_procgen.sh /
    jobs/eval_procgen.sh are hand-maintained against main_procgen.py)."""
    import shlex

    env = make_cli_env()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "reproduce_paper.py"),
         "--dry_run", "--seeds", "42", "--output", str(tmp_path / "out")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    dump = (
        "import importlib, json, sys\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from ml_collections import ConfigDict\n"
        "mod = importlib.import_module(sys.argv[1])\n"
        "keys = set()\n"
        "def rec(prefix, d):\n"
        "    for kk, vv in d.items():\n"
        "        keys.add(f'{prefix}.{kk}')\n"
        "        if isinstance(vv, ConfigDict): rec(f'{prefix}.{kk}', vv)\n"
        "for k, v in dict(mod.FLAGS_DEF).items():\n"
        "    keys.add(k)\n"
        "    if isinstance(v, ConfigDict): rec(k, v)\n"
        "print(json.dumps(sorted(keys)))\n"
    )
    declared = {}
    for mod in ("arp_tpu.train.main", "arp_tpu.train.eval"):
        # one subprocess per module: absl's global flag registry cannot hold
        # both CLIs' auto-registered flags in a single process
        out = subprocess.run([sys.executable, "-c", dump, mod], env=env,
                             capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-2000:]
        declared[mod] = set(json.loads(out.stdout))

    checked = 0
    for line in proc.stdout.splitlines():
        toks = shlex.split(line.strip()) if line.strip().startswith(sys.executable) else None
        if not toks:
            continue
        mod = toks[toks.index("-m") + 1]
        for t in toks:
            if t.startswith("--"):
                name = t[2:].split("=", 1)[0]
                assert name in declared[mod], f"{mod} has no flag --{name}"
                checked += 1
    assert checked > 40, f"matrix parsing broke (only {checked} flags seen)"


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
