"""scripts/stub_benchmark.py stage resume semantics.

The full seed matrix runs for hours through a shared TPU tunnel; an
interruption mid-stage must not redo finished work.  These tests pin the
markers each stage uses to skip completed runs (TRAIN_DONE per checkpoint,
per-run eval JSON sidecars) without spawning any real CLI subprocess.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "stub_benchmark", os.path.join(REPO, "scripts", "stub_benchmark.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _matrix(mod, seeds):
    return [(split, method, seed)
            for split, sc in mod.SPLITS.items()
            for method in sc["methods"] for seed in seeds]


def test_stage_train_skips_done_runs(tmp_path, monkeypatch):
    mod = _load_module()
    seeds = [0]
    matrix = _matrix(mod, seeds)
    assert len(matrix) == 5  # reward: arpdt/bc/gcbc, goal: bc/gcbc

    # mark the first two runs complete
    for split, method, seed in matrix[:2]:
        ckpt = tmp_path / f"ckpt_{split}_{method}_s{seed}"
        ckpt.mkdir()
        (ckpt / "TRAIN_DONE").write_text("ok\n")

    launched = []

    def fake_run(cmd, env, log_path, retries=2):
        # the checkpoint dir flag identifies the run
        ckpt = [a for a in cmd if a.startswith("--checkpoint_dir=")][0]
        launched.append(os.path.basename(ckpt.split("=", 1)[1]))
        os.makedirs(os.path.dirname(log_path), exist_ok=True)

    monkeypatch.setattr(mod, "run", fake_run)
    # ckpt dirs must exist for the marker write after a "successful" run
    for split, method, seed in matrix[2:]:
        (tmp_path / f"ckpt_{split}_{method}_s{seed}").mkdir()
    mod.stage_train(str(tmp_path), mod.SMOKE, seeds)

    want = [f"ckpt_{s}_{m}_s{d}" for s, m, d in matrix[2:]]
    assert launched == want
    # every run now carries the marker, so a second pass launches nothing
    launched.clear()
    mod.stage_train(str(tmp_path), mod.SMOKE, seeds)
    assert launched == []


def test_stage_eval_resumes_from_sidecars(tmp_path, monkeypatch):
    mod = _load_module()
    seeds = [0]
    matrix = _matrix(mod, seeds)

    # pre-measured result for the first run
    split0, method0, seed0 = matrix[0]
    done = {"success_rate": 0.75, "return": 1.25}
    with open(tmp_path / f"eval_{split0}_{method0}_s{seed0}.json", "w") as f:
        json.dump(done, f)

    launched = []

    def fake_run(cmd, env, log_path, retries=2):
        launched.append(os.path.basename(log_path))
        with open(log_path, "w") as f:
            f.write("noise line\n{'success_rate': 0.5, 'return': 0.0}\n")

    monkeypatch.setattr(mod, "run", fake_run)
    results = mod.stage_eval(str(tmp_path), mod.SMOKE, seeds)

    key0 = f"{split0}/{method0}/s{seed0}"
    assert results[key0] == done  # loaded from the sidecar, not re-run
    assert f"eval_{split0}_{method0}_s{seed0}.log" not in launched
    assert len(launched) == len(matrix) - 1
    # each fresh run wrote its own sidecar for the next resume
    for split, method, seed in matrix[1:]:
        sidecar = tmp_path / f"eval_{split}_{method}_s{seed}.json"
        assert json.load(open(sidecar)) == {"success_rate": 0.5, "return": 0.0}
    # aggregate artifact exists and covers the whole matrix
    raw = json.load(open(tmp_path / "eval_raw.json"))
    assert set(raw) == {f"{s}/{m}/s{d}" for s, m, d in matrix}
