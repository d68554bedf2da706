"""Training-curve plotting utility.

Counterpart of the reference's PPG plotting helpers
(data/PPG/phasic_policy_gradient/graph_util.py: ema smoothing, mean±std bands
across runs, per-game grids) redesigned around this repo's two progress
formats:

  * metrics.jsonl   — every arp_tpu trainer/finetune/PPG run writes one
                      (logging_utils.JsonlLogger)
  * progress-*.csv  — the reference PPG result CSVs (results dirs)

Usage:
  python scripts/plot_progress.py RUN_DIR [RUN_DIR ...] --key train_loss \
      [--smoothing 0.9] [--out curves.png]

Multiple run dirs with the same --key are overlaid; when a dir glob matches
several seeds, a mean±std band is drawn across them.
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def ema(values, smoothing: float):
    """Exponential moving average with warmup correction (graph_util.py:19-32
    semantics: early points are debiased instead of seeded with the raw value)."""
    if not values or smoothing <= 0:
        return list(values)
    out = []
    acc = 0.0
    norm = 0.0
    for v in values:
        acc = acc * smoothing + v
        norm = norm * smoothing + 1.0
        out.append(acc / norm)
    return out


def read_run(path: str, key: str):
    """(steps, values) from a run dir or file (metrics.jsonl or progress CSV)."""
    if os.path.isdir(path):
        for name in ("metrics.jsonl",):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            csvs = [f for f in os.listdir(path) if f.startswith("progress") and f.endswith(".csv")]
            if not csvs:
                raise FileNotFoundError(f"no metrics.jsonl or progress*.csv under {path}")
            path = os.path.join(path, sorted(csvs)[0])
    steps, values = [], []
    if path.endswith(".jsonl"):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if key in rec:
                    steps.append(rec.get("step", len(steps)))
                    values.append(float(rec[key]))
    else:
        with open(path) as f:
            for i, row in enumerate(csv.DictReader(f)):
                if row.get(key) not in (None, "", "None"):
                    steps.append(float(row.get("misc/total_interacts", i) or i))
                    values.append(float(row[key]))
    return steps, values


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="run dirs or metrics files")
    ap.add_argument("--key", default="train_loss")
    ap.add_argument("--smoothing", type=float, default=0.0)
    ap.add_argument("--out", default="progress.png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7, 4.5))
    series = []
    for run in args.runs:
        steps, values = read_run(run, args.key)
        if not values:
            print(f"warning: {run} has no '{args.key}' entries")
            continue
        series.append((run, steps, ema(values, args.smoothing)))

    if not series:
        raise SystemExit(f"error: no run contains key '{args.key}' — nothing to plot")

    # mean±std band only when the runs are clearly seeds of ONE experiment:
    # identical step sequences, not merely equal lengths (equal lengths are
    # the norm for unrelated runs sharing epochs/log_freq)
    same_steps = all(s == series[0][1] for _, s, _ in series)
    if len(series) >= 2 and same_steps:
        arr = np.asarray([v for _, _, v in series])
        steps = series[0][1]
        ax.plot(steps, arr.mean(0), label=f"mean of {len(series)} runs")
        ax.fill_between(steps, arr.mean(0) - arr.std(0), arr.mean(0) + arr.std(0), alpha=0.25)
    else:
        for run, steps, values in series:
            ax.plot(steps, values, label=os.path.basename(os.path.normpath(run)))

    ax.set_xlabel("step")
    ax.set_ylabel(args.key)
    ax.set_title(args.title or args.key)
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(series)} series)")


if __name__ == "__main__":
    main()
