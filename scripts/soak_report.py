"""Summarize a run_soak.sh directory: steps progressed, restarts survived,
checkpoint/heartbeat health.  Prints one JSON object.

Usage: python scripts/soak_report.py <soak_dir>
"""

import argparse
import json
import os
import re
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    args = ap.parse_args()

    out = {"root": args.root}

    import glob
    hits = glob.glob(os.path.join(args.root, "out", "*soak*", "metrics.jsonl"))
    metrics = hits[0] if hits else ""
    steps, losses = [], []
    if metrics and os.path.exists(metrics):
        for line in open(metrics):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # a kill mid-write can truncate the last line
            for k in ("train_train_state_step", "train_state_step", "step"):
                if k in rec:
                    steps.append(int(rec[k]))
                    break
            if "train_loss" in rec:
                losses.append(float(rec["train_loss"]))
    out["max_step"] = max(steps) if steps else 0
    out["metric_records"] = len(steps)
    if losses:
        k = max(len(losses) // 10, 1)
        out["loss_first10pct_mean"] = round(sum(losses[:k]) / k, 4)
        out["loss_last10pct_mean"] = round(sum(losses[-k:]) / k, 4)

    soak_log = os.path.join(args.root, "soak.log")
    runs = rcs = unavailable = 0
    if os.path.exists(soak_log):
        text = open(soak_log).read()
        runs = len(re.findall(r"starting trainer chunk", text))
        rcs = len(re.findall(r"exited rc=", text))
        unavailable = len(re.findall(r"backend unavailable", text))
    out["trainer_chunks"] = runs
    out["chunk_exits"] = rcs
    out["dark_window_waits"] = unavailable

    trainer_log = os.path.join(args.root, "trainer.log")
    out["orbax_resumes"] = 0
    if os.path.exists(trainer_log):
        out["orbax_resumes"] = len(
            re.findall(r"resumed from orbax step", open(trainer_log, errors="replace").read())
        )

    hbs = glob.glob(os.path.join(args.root, "out", "*soak*", "heartbeat"))
    hb = hbs[0] if hbs else ""
    out["heartbeat_age_s"] = (
        round(time.time() - os.path.getmtime(hb), 1) if hb and os.path.exists(hb) else None
    )
    ckpt = os.path.join(args.root, "ckpt")
    out["checkpoint_steps"] = sorted(
        int(d) for d in os.listdir(ckpt) if d.isdigit()
    ) if os.path.isdir(ckpt) else []

    out["ok"] = bool(out["max_step"] > 0 and out["checkpoint_steps"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
