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

Experiment mode (the reference ``graph.py`` workflows — labeled run groups,
per-game subplot grids, min-max-normalized mean score):

  python scripts/plot_progress.py --key eprewmean \
      --group 'ppg=results/ppg-run0,results/ppg-run1,results/ppg-run2' \
      --group 'ppo=results/ppo-run0,results/ppo-run1' \
      --games coinrun,maze [--normalize_and_reduce] [--first_valid 10]

Group paths may contain ``{game}``; plain results dirs resolve
``progress-{game}.csv`` inside themselves (the reference layout).
"""

from __future__ import annotations

import argparse
import csv
import json
import os

# Procgen hard-mode score ranges for normalize-and-reduce (reference
# data/PPG/phasic_policy_gradient/constants.py — published PPG paper
# constants; pure data, required for comparable normalized scores)
HARD_GAME_RANGES = {
    "coinrun": (5, 10), "starpilot": (1.5, 35), "caveflyer": (2, 13.4),
    "dodgeball": (1.5, 19), "fruitbot": (-0.5, 27.2), "chaser": (0.5, 14.2),
    "miner": (1.5, 20), "jumper": (1, 10), "leaper": (1.5, 10),
    "maze": (4, 10), "bigfish": (0, 40), "heist": (2, 10),
    "climber": (1, 12.6), "plunder": (3, 30), "ninja": (2, 10),
    "bossfight": (0.5, 13),
}


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


def resolve_game_path(path: str, game: str) -> str:
    """A group path for one game: ``{game}`` template, the reference's
    ``progress-{game}.csv`` inside a results dir, or the path itself."""
    if "{game}" in path:
        return path.format(game=game)
    if os.path.isdir(path):
        csv_path = os.path.join(path, f"progress-{game}.csv")
        if os.path.exists(csv_path):
            return csv_path
    return path


def load_group_values(paths, key, game, smoothing=0.0, first_valid=0):
    """(runs, T) value matrix for one (group, game) — truncated to the
    shortest run, ema-smoothed, first_valid leading points dropped (the
    reference drops them to avoid the short-episode reward-buffer bias)."""
    import numpy as np

    series = [read_run(resolve_game_path(p, game), key)[1] for p in paths]
    series = [s for s in series if s]
    if not series:
        raise SystemExit(f"error: no '{key}' data for game {game!r} in {paths}")
    n = min(len(s) for s in series)
    arr = np.asarray([ema(s[:n], smoothing) for s in series], np.float64)
    return arr[:, first_valid:]


def normalize_reduce(per_game_values, games, ranges=HARD_GAME_RANGES):
    """Min-max normalize each game by its published range, mean over games
    (graph.py --normalize_and_reduce). per_game_values: {game: (runs, T)}."""
    import numpy as np

    n = min(v.shape[1] for v in per_game_values.values())
    normed = [
        (per_game_values[g][:, :n] - ranges[g][0]) / (ranges[g][1] - ranges[g][0])
        for g in games
    ]
    return np.mean(normed, axis=0)


def plot_experiment(args):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    groups = []
    for spec in args.group:
        label, _, paths = spec.partition("=")
        if not paths:
            raise SystemExit(f"--group must be 'label=path1,path2,...', got {spec!r}")
        groups.append((label, paths.split(",")))
    games = [g.strip() for g in args.games.split(",") if g.strip()]
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]

    if args.normalize_and_reduce or len(games) <= 1:
        fig, ax = plt.subplots(figsize=(7, 5))
        axes = {g: ax for g in games}
        single = True
    else:
        dim = int(np.ceil(np.sqrt(len(games))))
        fig, axarr = plt.subplots(
            int(np.ceil(len(games) / dim)), dim, sharex=True,
            figsize=(3.2 * dim, 2.6 * np.ceil(len(games) / dim)), squeeze=False)
        axes = {g: axarr.flat[i] for i, g in enumerate(games)}
        for extra in axarr.flat[len(games):]:
            extra.axis("off")
        single = False

    for gi, (label, paths) in enumerate(groups):
        per_game = {
            g: load_group_values(paths, args.key, g, args.smoothing, args.first_valid)
            for g in games
        }
        color = colors[gi % len(colors)]
        if args.normalize_and_reduce:
            data = {None: normalize_reduce(per_game, games)}
        else:
            data = per_game
        for game, arr in data.items():
            ax = axes[games[0] if game is None else game]
            x = (np.arange(arr.shape[1]) + args.first_valid) * args.x_scale
            ax.plot(x, arr.mean(0), color=color,
                    label=label if (single or game == games[0]) else None)
            if arr.shape[0] > 1:
                ax.fill_between(x, arr.mean(0) - arr.std(0, ddof=1),
                                arr.mean(0) + arr.std(0, ddof=1),
                                color=color, alpha=0.25, linewidth=0)
            if game is not None and not single:
                ax.set_title(game, fontsize=10)

    ylabel = "mean normalized score" if args.normalize_and_reduce else args.key
    if single:
        next(iter(axes.values())).set_xlabel("step" if args.x_scale == 1 else "timesteps (M)")
        next(iter(axes.values())).set_ylabel(ylabel)
        next(iter(axes.values())).grid(alpha=0.3)
    fig.legend(loc="lower right", fontsize=9)
    fig.suptitle(args.title or ylabel)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(groups)} groups x {len(games)} games)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="*", help="run dirs or metrics files")
    ap.add_argument("--key", default="train_loss")
    ap.add_argument("--smoothing", type=float, default=0.0)
    ap.add_argument("--out", default="progress.png")
    ap.add_argument("--title", default=None)
    # experiment mode (reference graph.py)
    ap.add_argument("--group", action="append", default=[],
                    help="label=path1,path2,... (repeatable; paths may contain {game})")
    ap.add_argument("--games", default="",
                    help="comma game list -> per-game grid (or reduce)")
    ap.add_argument("--normalize_and_reduce", action="store_true",
                    help="min-max normalize per game (published ranges), mean over games")
    ap.add_argument("--first_valid", type=int, default=0,
                    help="drop the first N points (reward-buffer warmup bias)")
    ap.add_argument("--x_scale", type=float, default=1.0,
                    help="x multiplier (e.g. env steps per logged point / 1e6)")
    args = ap.parse_args()

    if args.group:
        if not args.games:
            raise SystemExit("--group requires --games (one or more)")
        return plot_experiment(args)
    if not args.runs:
        raise SystemExit("provide run dirs, or --group/--games for experiment mode")

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
