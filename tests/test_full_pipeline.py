"""The full ARP pipeline end-to-end: collect -> label -> train -> eval.

Mirrors the reference's five README stages (SURVEY.md top) on the virtual CPU
mesh with the fake env and a tiny CLIP: demonstrations are collected with a
scripted expert, labeled with CLIP rewards by the real labeler, used to train
an ARPDT policy through the real trainer CLI, and evaluated with rollouts.
"""

import json
import os
import subprocess
import sys

import h5py
import numpy as np

from arp_tpu.collect.recorder import collect_demonstrations
from arp_tpu.envs.fake import FakeProcgen
from arp_tpu.reward.labeler import label_rewards
from arp_tpu.testing import make_tiny_clip_engine, scripted_coin_expert as scripted_expert

DATASET = "coinrun_hard_level0to500_num4_frame8"


def test_five_stage_pipeline(tmp_path):
    data_root = tmp_path / "demos" / DATASET
    data_root.mkdir(parents=True)

    # --- stage 1: collect expert demos (train + val) ---
    for split, n_eps in (("train", 4), ("val", 2)):
        env = FakeProcgen("coinrun", {"episode_length": 30, "image_size": 32, "grid": 4})
        rec = collect_demonstrations(
            env,
            scripted_expert,
            str(data_root / f"data_{split}.hdf5"),
            num_episodes=n_eps,
            game_name="coinrun",
            num_frames=8,
            seed=0 if split == "train" else 100,
        )
        assert rec.num_recorded == n_eps

    # --- stage 2: label CLIP rewards (tiny CLIP, real labeler) ---
    engine = make_tiny_clip_engine(batch_size=8)
    for split in ("train", "val"):
        stats = label_rewards(
            str(data_root / f"data_{split}.hdf5"),
            "the goal is to collect the coin.",
            engine=engine,
            progress=False,
        )
        assert stats["frames"] > 0
    with h5py.File(data_root / "data_train.hdf5", "r") as g:
        assert "ob_clip_reward" in g and "ob_clip_pos_rtg" in g

    # --- stage 4: train ARPDT on the labeled demos (real CLI) ---
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")
    from tests.cli_env import make_cli_env

    env_vars = make_cli_env()
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=2", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
        "--val_every_epochs=0", "--test_every_epochs=1", "--num_test_episodes=1",
        "--episode_length=6", "--eval_env=fake",
        f"--checkpoint_dir={ckpt_dir}",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={tmp_path / 'demos'}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=4", "--data.use_vl=True",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env_vars, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]

    records = [
        json.loads(line)
        for line in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))
    ]
    # stage 5 happened inside training (rollout eval with rtg conditioning)
    assert any("test/return" in r for r in records)
    assert any("train_loss" in r for r in records)

    # --- stage 5 standalone: eval driver against the checkpoint ---
    eval_cmd = [
        sys.executable, "-m", "arp_tpu.train.eval",
        f"--checkpoint_dir={ckpt_dir}", "--num_test_episodes=1", "--episode_length=6",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
        "--eval_env=fake", "--window_size=4",
        # seeded temperature sampling (round-5 ordering-eval decode path)
        "--eval_temperature=0.7",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={tmp_path / 'demos'}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=4", "--data.use_vl=True",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(eval_cmd, env=env_vars, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the driver prints the metric dict as its last line — parse and check the
    # actual values, not just a substring
    import ast as _ast

    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    metrics = _ast.literal_eval(last)
    assert "return" in metrics and "episode_length" in metrics, metrics
    assert np.isfinite(metrics["return"]) and metrics["episode_length"] > 0, metrics
