"""soak_report.py parses the real trainer/logger layouts (guards the
scripts' assumptions about metric keys, dir naming, and log phrases)."""

import json
import os
import subprocess
import sys


def test_soak_report_summarizes_fabricated_soak_dir(tmp_path):
    root = tmp_path / "soak"
    exp = root / "out" / "arp-tpu--soak"   # MetricsLogger: <output_dir>/<prefix>--<id>
    exp.mkdir(parents=True)
    with open(exp / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"cost/num_params": 10}) + "\n")
        for step, loss in ((4, 2.0), (8, 1.5), (12, 1.0)):
            f.write(json.dumps({"train_train_state_step": step, "train_loss": loss}) + "\n")
        f.write('{"truncated mid-write')  # a kill can cut the last line
    (exp / "heartbeat").write_text("1")
    ckpt = root / "ckpt"
    for step in (4, 8, 12):
        (ckpt / str(step)).mkdir(parents=True)
    with open(root / "soak.log", "w") as f:
        f.write("[soak] run 1: backend unavailable, sleeping 60s\n")
        f.write("[soak] run 2: starting trainer chunk (00:00:00)\n")
        f.write("[soak] run 2: trainer exited rc=124 (00:25:00)\n")
        f.write("[soak] run 3: starting trainer chunk (00:25:05)\n")
    (root / "trainer.log").write_text("resumed from orbax step 8\n")

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "soak_report.py"),
         str(root)],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    rep = json.loads(out.stdout)
    assert rep["max_step"] == 12
    assert rep["metric_records"] == 3
    assert rep["trainer_chunks"] == 2
    assert rep["dark_window_waits"] == 1
    assert rep["orbax_resumes"] == 1
    assert rep["checkpoint_steps"] == [4, 8, 12]
    assert rep["heartbeat_age_s"] is not None
    assert rep["ok"] is True
