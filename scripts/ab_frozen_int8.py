"""frozen_bf16 vs frozen_int8(+attn) training-quality A/B (VERDICT r4 #5).

The int8 frozen-tower path's quality evidence was forward-only (per-step
action-pred cosine > 0.95).  This script measures what an opt-in user
actually gets: the SAME flagship-shaped config (frozen m3ae transfer tower +
adapter ARPDT) trained to the same budget on the same stub demos under both
tower numerics, comparing final validation action accuracy and eval success
over seeds.  The frozen tower is a random-init tiny m3ae exported through
the reference pickle format (no pretrained weights exist in this image; a
fixed random tower still answers the question — does training THROUGH the
int8 tower reach the bf16 tower's quality at matched budget?).

Usage:
  python scripts/ab_frozen_int8.py --data stub_results_w1 --output ./ab_int8 \
      --seeds 0,1 --device tpu
(--data must hold a stub_benchmark run's demos_reward/eval_reward +
reward_clip.npz + label_separation.json; stages resume via markers.)
"""

import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from stub_benchmark import (  # noqa: E402
    EVAL_TEMPERATURE, FULL, SPLITS, dataset_dir, run, stage_env,
)

TINY_M3AE = dict(model_type="custom", emb_dim=32, dec_emb_dim=16, depth=2,
                 dec_depth=1, num_heads=4, dec_num_heads=4, mlp_ratio=2)
VARIANTS = {
    "frozen_bf16": ["--model.frozen_bf16=True"],
    "frozen_int8": ["--model.frozen_int8=True"],  # int8_attn auto-resolves on
}


def export_tiny_tower(path: str):
    """Random-init tiny m3ae -> reference pickle (the loader's wire format)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from arp_tpu.models import m3ae as m3ae_lib

    # model_type=None: no size-preset override — the CLI's "custom" and this
    # None both leave the explicit tiny dims in force (dryrun convention)
    model = m3ae_lib.MaskedMultimodalAutoencoder(
        config_updates=dict(TINY_M3AE, model_type=None), text_vocab_size=30522,
    )
    probe = jnp.zeros((1, 16, 16 * 16 * 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, probe, None, None,
                             method=model.forward_representation, deterministic=True)
    )(jax.random.PRNGKey(11))
    ref = m3ae_lib.export_reference_m3ae_params(variables["params"])
    with open(path, "wb") as f:
        pickle.dump(ref, f)
    return path


def flags_for(data_dir, tower_pkl, seed, window):
    sc = SPLITS["reward"]
    return [
        f"--seed={seed}",
        f"--game_name={sc['game']}", f"--window_size={window}", "--use_crop=False",
        "--episode_length=24", "--eval_env=fake", "--env_hidden_goal=False",
        # flagship shape: FROZEN m3ae transfer tower + adapter (vs the stub
        # matrix's use_from_scratch) — the thing frozen_int8 quantizes
        "--model.model_type=vit_debug",
        f"--model.transfer_type=m3ae_{tower_pkl}",
        "--model.use_from_scratch=False", "--model.use_adapter=True",
    ] + [f"--model.m3ae.{k}={v}" for k, v in TINY_M3AE.items()] + [
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={os.path.join(data_dir, 'demos_reward')}",
        "--data.image_size=32", "--data.num_frames=8",
        f"--data.window_size={window}",
        f"--data.num_demonstrations={FULL['train_eps']}",
        "--use_vl=True", "--vl_type=clip", "--data.use_vl=True",
        "--data.vl_type=clip", "--model.lambda_return_pred=0.1",
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="./stub_results_w1")
    p.add_argument("--output", default="./ab_int8")
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    p.add_argument("--window", type=int, default=1)
    p.add_argument("--epochs", type=int, default=FULL["epochs"])
    args = p.parse_args()

    data = os.path.abspath(args.data)
    out = os.path.abspath(args.output)
    os.makedirs(out, exist_ok=True)
    seeds = [int(s) for s in args.seeds.split(",")]
    env = stage_env(args.device)

    tower = os.path.join(out, "tiny_m3ae_tower.pkl")
    if not os.path.exists(tower):
        export_tiny_tower(tower)
        print(f"[ab] exported random tiny tower -> {tower}")

    spec = os.path.join(data, "reward_clip.npz")
    expert_rtg = json.load(open(os.path.join(data, "label_separation.json")))[
        "expert_return_p90"]

    results = {}
    for variant, vflags in VARIANTS.items():
        for seed in seeds:
            tag = f"{variant}_s{seed}"
            ckpt = os.path.join(out, f"ckpt_{tag}")
            logs = os.path.join(out, "logs", tag)
            done = os.path.join(ckpt, "TRAIN_DONE")
            base = flags_for(data, tower, seed, args.window) + [
                f"--vl_checkpoint={spec}"] + vflags
            if not os.path.exists(done):
                cmd = [sys.executable, "-m", "arp_tpu.train.main",
                       f"--epochs={args.epochs}", "--warmup_epochs=0",
                       f"--batch_size={FULL['batch_size']}", "--lr=1e-3",
                       "--dataloader_n_workers=0", "--val_every_epochs=3",
                       f"--test_every_epochs={args.epochs}", "--num_test_episodes=0",
                       f"--checkpoint_dir={ckpt}",
                       f"--logging.output_dir={logs}"] + base
                print(f"[ab/train] {tag}", flush=True)
                run(cmd, env, os.path.join(out, f"train_{tag}.log"))
                open(done, "w").write("ok\n")

            per_run = os.path.join(out, f"eval_{tag}.json")
            if not os.path.exists(per_run):
                cmd = [sys.executable, "-m", "arp_tpu.train.eval",
                       f"--checkpoint_dir={ckpt}",
                       f"--num_test_episodes={FULL['episodes']}",
                       f"--eval_parallel_envs={FULL['parallel_envs']}",
                       f"--eval_data_path={os.path.join(data, 'eval_reward')}",
                       "--eval_data_name=data_train.hdf5",
                       f"--eval_temperature={EVAL_TEMPERATURE}",
                       f"--return_to_go={expert_rtg}",
                       f"--logging.output_dir={logs}"] + base
                print(f"[ab/eval] {tag}", flush=True)
                log = os.path.join(out, f"eval_{tag}.log")
                run(cmd, env, log)
                import ast
                lines = [l for l in open(log).read().splitlines() if l.startswith("{")]
                with open(per_run, "w") as f:
                    json.dump(ast.literal_eval(lines[-1]), f, indent=1)

            # final val accuracy from the trainer's metrics stream
            val_acc = None
            for root, _, files in os.walk(logs):
                for fn in files:
                    if fn == "metrics.jsonl":
                        for line in open(os.path.join(root, fn)):
                            rec = json.loads(line)
                            if "val_acc" in rec:
                                val_acc = rec["val_acc"]
            results[tag] = dict(json.load(open(per_run)), final_val_acc=val_acc)
            print(f"[ab] {tag}: {results[tag]}")

    table = {}
    for variant in VARIANTS:
        accs = [results[f"{variant}_s{s}"]["final_val_acc"] for s in seeds]
        srs = [results[f"{variant}_s{s}"]["success_rate"] for s in seeds]
        rets = [results[f"{variant}_s{s}"]["return"] for s in seeds]
        table[variant] = {
            "final_val_acc_mean": float(np.mean([a for a in accs if a is not None])) if any(a is not None for a in accs) else None,
            "success_rate_mean": float(np.mean(srs)),
            "success_rate_per_seed": [float(x) for x in srs],
            "return_mean": float(np.mean(rets)),
        }
    summary = {"table": table, "seeds": seeds, "window": args.window,
               "epochs": args.epochs, "per_run": results}
    with open(os.path.join(out, "ab_results.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(table, indent=1))
    print(f"[ab] written to {os.path.join(out, 'ab_results.json')}")


if __name__ == "__main__":
    main()
