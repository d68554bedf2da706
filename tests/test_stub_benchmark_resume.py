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
    # claim-priority execution order (RUN_ORDER), not SPLITS declaration order
    return [(split, method, seed)
            for split, method in mod.ordered_runs() for seed in seeds]


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


def _variant_matrix(mod, seeds, sep):
    return [(split, method, seed, variant)
            for split, method in mod.ordered_runs() for seed in seeds
            for variant, _, _ in mod.eval_variants(split, method, sep)]


def test_stage_eval_resumes_from_sidecars(tmp_path, monkeypatch):
    mod = _load_module()
    seeds = [0]
    sep = {"expert_return_p90": 70.0,
           "anti": {"return_mean": -556.0}, "random": {"return_mean": -203.0}}
    with open(tmp_path / "label_separation.json", "w") as f:
        json.dump(sep, f)
    matrix = _variant_matrix(mod, seeds, sep)
    # every (split, method, seed) has a sampled primary + greedy variant,
    # arpdt additionally the 4-point rtg sweep, gcbc the goal-swap probe
    assert ("reward", "arpdt", 0, "primary") in matrix
    assert ("reward", "arpdt", 0, "rtg_anti") in matrix
    assert ("goal", "gcbc", 0, "goalswap") in matrix
    assert len(matrix) == 5 * 2 + 4 + 2  # 5 runs x {primary,greedy} + sweep + 2 gcbc swaps

    # pre-measured result for the first run
    split0, method0, seed0, variant0 = matrix[0]
    done = {"success_rate": 0.75, "return": 1.25}
    with open(tmp_path / f"eval_{split0}_{method0}_s{seed0}_{variant0}.json", "w") as f:
        json.dump(done, f)

    launched = []

    def fake_run(cmd, env, log_path, retries=2):
        launched.append(os.path.basename(log_path))
        with open(log_path, "w") as f:
            f.write("noise line\n{'success_rate': 0.5, 'return': 0.0}\n")

    monkeypatch.setattr(mod, "run", fake_run)
    # eval only runs against finished checkpoints (follow-behind worker)
    for split, method, seed, _ in matrix:
        ckpt = tmp_path / f"ckpt_{split}_{method}_s{seed}"
        ckpt.mkdir(exist_ok=True)
        (ckpt / "TRAIN_DONE").write_text("ok\n")
    results = mod.stage_eval(str(tmp_path), mod.SMOKE, seeds)

    key0 = f"{split0}/{method0}/s{seed0}/{variant0}"
    assert results[key0] == done  # loaded from the sidecar, not re-run
    assert f"eval_{split0}_{method0}_s{seed0}_{variant0}.log" not in launched
    assert len(launched) == len(matrix) - 1
    # each fresh run wrote its own sidecar for the next resume
    for split, method, seed, variant in matrix[1:]:
        sidecar = tmp_path / f"eval_{split}_{method}_s{seed}_{variant}.json"
        assert json.load(open(sidecar)) == {"success_rate": 0.5, "return": 0.0}
    # aggregate artifact exists and covers the whole matrix
    raw = json.load(open(tmp_path / "eval_raw.json"))
    assert set(raw) == {f"{s}/{m}/s{d}/{v}" for s, m, d, v in matrix}


def test_stage_eval_follow_behind_skips_untrained(tmp_path, monkeypatch):
    """The follow-behind eval worker skips runs whose checkpoint is still
    training, evaluates everything it can, writes the partial eval_raw.json,
    and fails the pass so the worker loop retries later."""
    import pytest
    mod = _load_module()
    seeds = [0]
    sep = {"expert_return_p90": 70.0, "anti": {"return_mean": -556.0}}
    with open(tmp_path / "label_separation.json", "w") as f:
        json.dump(sep, f)
    matrix = _variant_matrix(mod, seeds, sep)
    runs = list(dict.fromkeys((s, m, d) for s, m, d, _ in matrix))
    # only the first (split, method, seed) has finished training
    first = runs[0]
    ckpt = tmp_path / f"ckpt_{first[0]}_{first[1]}_s{first[2]}"
    ckpt.mkdir()
    (ckpt / "TRAIN_DONE").write_text("ok\n")

    launched = []

    def fake_run(cmd, env, log_path, retries=2):
        launched.append(os.path.basename(log_path))
        with open(log_path, "w") as f:
            f.write("{'success_rate': 0.5, 'return': 0.0}\n")

    monkeypatch.setattr(mod, "run", fake_run)
    with pytest.raises(RuntimeError, match="still training"):
        mod.stage_eval(str(tmp_path), mod.SMOKE, seeds)
    n_first = len(mod.eval_variants(first[0], first[1], sep))
    assert len(launched) == n_first  # only the trained run's variants
    raw = json.load(open(tmp_path / "eval_raw.json"))  # partial raw exists
    assert len(raw) == n_first


def test_stage_report_partial_matrix(tmp_path):
    """A wall-clock-truncated matrix reports per-method evaluated seeds and
    null (pending) ordering claims instead of crashing or fabricating."""
    mod = _load_module()
    seeds = [0, 1]
    # only reward/arpdt s0+s1 evaluated
    raw = {}
    for s in seeds:
        for variant in ("primary", "greedy"):
            raw[f"reward/arpdt/s{s}/{variant}"] = {
                "success_rate": 0.4, "return": 4.0, "episode_length": 20.0}
    with open(tmp_path / "eval_raw.json", "w") as f:
        json.dump(raw, f)
    results = mod.stage_report(str(tmp_path), seeds, window=1)
    assert results["partial"] is True
    assert results["table"]["reward"]["arpdt"]["seeds_evaluated"] == seeds
    assert results["table"]["reward"]["bc"] is None
    assert results["ordering"] == {"reward_split_arpdt_gt_bc": None,
                                   "goal_split_gcbc_gt_bc": None}
    md = mod.render_results_markdown(results)
    assert "PARTIAL matrix" in md and "pending" in md
    assert "(not yet evaluated)" in md


def test_stage_report_table_probes_and_docs(tmp_path):
    """stage_report aggregates variants into table + probes, and
    write_docs_table substitutes the generated markdown into the doc's
    RESULTS_TABLE region (docs cannot drift from artifacts)."""
    mod = _load_module()
    seeds = [0, 1]
    sep = {"expert_return_p90": 70.0,
           "anti": {"return_mean": -556.0}, "random": {"return_mean": -203.0}}
    with open(tmp_path / "label_separation.json", "w") as f:
        json.dump(sep, f)

    sr = {"primary": {"arpdt": 0.6, "bc": 0.2, "gcbc": 0.3},
          "greedy": {"arpdt": 0.5, "bc": 0.2, "gcbc": 0.25}}
    raw = {}
    for split, sc in mod.SPLITS.items():
        for method in sc["methods"]:
            for s in seeds:
                for variant, _, _ in mod.eval_variants(split, method, sep):
                    if variant.startswith("rtg_"):
                        v = {"rtg_anti": 0.1, "rtg_zero": 0.2,
                             "rtg_expert_p90": 0.55, "rtg_expert_2x": 0.5}[variant]
                    elif variant == "goalswap":
                        v = 0.1
                    else:
                        v = sr[variant][method]
                    raw[f"{split}/{method}/s{s}/{variant}"] = {
                        "success_rate": v, "return": v * 10, "episode_length": 20.0}
    with open(tmp_path / "eval_raw.json", "w") as f:
        json.dump(raw, f)

    results = mod.stage_report(str(tmp_path), seeds, window=1)
    assert results["ordering"] == {"reward_split_arpdt_gt_bc": True,
                                   "goal_split_gcbc_gt_bc": True}
    probe = results["probes"]["rtg_monotonicity"]
    assert probe["responds"] is True  # 0.55 @ p90 > 0.1 @ anti
    assert probe["mean_curve"]["rtg_anti".removeprefix("rtg_")] == 0.1
    swap = results["probes"]["goal_swap"]["goal"]
    assert swap["reads_goal"] is True and swap["true_minus_swapped_mean"] > 0

    doc = tmp_path / "DOC.md"
    doc.write_text("# title\n\n<!-- RESULTS_TABLE -->\n\ntail\n")
    mod.write_docs_table(results, str(doc))
    text = doc.read_text()
    assert "| reward | arpdt | 0.600" in text and "tail" in text
    assert text.count("<!-- RESULTS_TABLE -->") == 1
    # idempotent: a re-run replaces the region instead of appending
    mod.write_docs_table(results, str(doc))
    assert doc.read_text().count("| reward | arpdt | 0.600") == 1
