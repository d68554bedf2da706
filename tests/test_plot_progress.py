"""plot_progress experiment mode: the reference graph.py workflows
(grouped runs, per-game grids, normalized mean score) against fabricated
results dirs.  Reference: data/PPG/phasic_policy_gradient/{graph,graph_util}.py.
"""

import csv
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO_ROOT, "scripts", "plot_progress.py")
sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))

import plot_progress  # noqa: E402


def _write_results_dir(root, name, games, n=20, offset=0.0):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    for gi, game in enumerate(games):
        with open(os.path.join(d, f"progress-{game}.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["misc/total_interacts", "eprewmean"])
            for i in range(n):
                w.writerow([i * 1000, offset + gi + i * 0.1])
    return d


def test_resolve_game_path(tmp_path):
    d = _write_results_dir(tmp_path, "ppg-run0", ["coinrun"])
    p = plot_progress.resolve_game_path(d, "coinrun")
    assert p.endswith("progress-coinrun.csv")
    # {game} template
    t = os.path.join(str(tmp_path), "runs", "{game}", "metrics.jsonl")
    assert plot_progress.resolve_game_path(t, "maze") == os.path.join(
        str(tmp_path), "runs", "maze", "metrics.jsonl")


def test_load_group_values_truncates_and_drops_warmup(tmp_path):
    d0 = _write_results_dir(tmp_path, "r0", ["coinrun"], n=20)
    d1 = _write_results_dir(tmp_path, "r1", ["coinrun"], n=15, offset=1.0)
    arr = plot_progress.load_group_values([d0, d1], "eprewmean", "coinrun",
                                          first_valid=3)
    assert arr.shape == (2, 12)  # min(20, 15) - 3
    # row 1 is offset by +1 everywhere
    assert np.allclose(arr[1] - arr[0], 1.0)


def test_normalize_reduce_uses_published_ranges():
    per_game = {
        "coinrun": np.full((2, 5), 10.0),  # range [5, 10] -> 1.0
        "maze": np.full((2, 5), 4.0),      # range [4, 10] -> 0.0
    }
    out = plot_progress.normalize_reduce(per_game, ["coinrun", "maze"])
    assert out.shape == (2, 5)
    assert np.allclose(out, 0.5)


@pytest.mark.parametrize("extra", [[], ["--normalize_and_reduce"]])
def test_experiment_mode_cli(tmp_path, extra):
    games = ["coinrun", "maze"]
    g1 = [_write_results_dir(tmp_path, f"ppg-run{i}", games, offset=0.1 * i)
          for i in range(2)]
    g2 = [_write_results_dir(tmp_path, f"ppo-run{i}", games, offset=1 + 0.1 * i)
          for i in range(2)]
    out = os.path.join(str(tmp_path), "exp.png")
    cmd = [sys.executable, SCRIPT, "--key", "eprewmean",
           "--group", "ppg=" + ",".join(g1), "--group", "ppo=" + ",".join(g2),
           "--games", ",".join(games), "--first_valid", "2",
           "--out", out] + extra
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_jsonl_runs_still_work(tmp_path):
    run = tmp_path / "run0"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"step": i, "train_loss": 1.0 / (i + 1)}) + "\n")
    out = os.path.join(str(tmp_path), "loss.png")
    proc = subprocess.run(
        [sys.executable, SCRIPT, str(run), "--key", "train_loss", "--out", out],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(out)
