"""End-to-end trainer CLI test: synthetic demos -> label -> train -> eval rollout.

Exercises the full pipeline through the real command-line surface in a
subprocess on the virtual 8-device CPU mesh.
"""

import json
import os
import subprocess
import sys

import h5py
import numpy as np
import pytest

DATASET = "coinrun_hard_level0to500_num20_frame8"


def make_labeled_dataset(root, n=48, num_frames=8, img=32):
    ddir = os.path.join(root, DATASET)
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, count in (("train", n), ("val", 16)):
        path = os.path.join(ddir, f"data_{split}.hdf5")
        with h5py.File(path, "w") as g:
            g.create_dataset(
                "ob", data=rng.integers(0, 256, size=(count, num_frames, img, img, 3), dtype=np.uint8)
            )
            g.create_dataset("act", data=rng.integers(0, 15, size=(count, num_frames)).astype(np.int64))
            done = np.zeros((count, num_frames), bool)
            for end in range(count // 8, count + 1, count // 4):
                done[min(end, count) - 1, -1] = True
            done[count - 1, -1] = True
            g.create_dataset("done", data=done)
            # synthetic labeled rewards (as the labeler would write)
            rewards = rng.normal(size=(count,)).astype(np.float32) * 10 + 200
            rows = np.repeat(rewards[:, None], num_frames, axis=1)
            g.create_dataset("ob_clip_reward", data=rows)
            g.create_dataset("ob_clip_pos_rtg", data=rows)
    return ddir


@pytest.mark.parametrize("vl_type,use_vl", [("BC", False), ("GCBC", False)])
def test_trainer_cli_baselines(tmp_path, vl_type, use_vl):
    """BC (InstructRL) and GCBC baseline paths through the CLI."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")

    from tests.cli_env import make_cli_env

    env = make_cli_env()

    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        f"--use_vl={use_vl}", f"--vl_type={vl_type}", "--use_crop=False",
        "--game_name=coinrun", "--val_every_epochs=0", "--test_every_epochs=0",
        "--eval_env=none",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    exp_dirs = os.listdir(out_dir)
    records = [json.loads(line) for line in open(os.path.join(out_dir, exp_dirs[0], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)


def test_pretrain_m3ae_cli(tmp_path):
    """M3AE pretraining CLI runs end-to-end on tiny demos."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    from tests.cli_env import make_cli_env

    env = make_cli_env()

    cmd = [
        sys.executable, "-m", "arp_tpu.train.pretrain_m3ae",
        "--epochs=1", "--batch_size=8", "--log_freq=1", "--lr=1e-4",
        f"--dataset_name={DATASET}",
        "--patch_size=8", "--image_size=32", "--text_length=16",
        f"--checkpoint_dir={ckpt_dir}",
        "--model.model_type=custom", "--model.emb_dim=32", "--model.dec_emb_dim=16",
        "--model.depth=2", "--model.dec_depth=1", "--model.num_heads=4",
        "--model.dec_num_heads=4", "--model.mlp_ratio=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    records = [json.loads(l) for l in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))]
    assert any("image_loss" in r for r in records)
    assert os.listdir(ckpt_dir)


def test_trainer_cli_m3ae_from_scratch(tmp_path):
    """ARPDT with a from-scratch M3AE encoder trained jointly (no checkpoint)."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")

    from tests.cli_env import make_cli_env

    env = make_cli_env()
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=1", "--lr=1e-3", "--window_size=4",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
        "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
        "--patch_dim=8", "--encode_image_size=32",
        "--model.model_type=vit_debug", "--model.transfer_type=m3ae_vit_b16",
        "--model.use_from_scratch=True",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        "--model.m3ae.model_type=custom", "--model.m3ae.emb_dim=32", "--model.m3ae.depth=2",
        "--model.m3ae.num_heads=4", "--model.m3ae.mlp_ratio=2",
        "--model.m3ae.dec_emb_dim=16", "--model.m3ae.dec_depth=1", "--model.m3ae.dec_num_heads=4",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20", "--data.use_vl=True",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    records = [json.loads(l) for l in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)


def test_trainer_cli_cached_embeddings(tmp_path):
    """Cached-embedding training through the CLI (no encoder, no frames on device)."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    # write synthetic cached embeddings for both splits
    for split in ("train", "val"):
        path = os.path.join(data_root, DATASET, f"data_{split}.hdf5")
        with h5py.File(path, "a") as g:
            n = g["ob"].shape[0]
            emb = np.random.default_rng(1).normal(size=(n, 24)).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
            g.create_dataset("ob_clip_emb", data=emb)

    out_dir = str(tmp_path / "out")
    from tests.cli_env import make_cli_env

    env = make_cli_env()
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=1", "--lr=1e-3", "--window_size=4",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
        "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
        "--model.model_type=vit_debug", "--model.transfer_type=clip_vit_b16_cached",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2", "--model.use_adapter=True",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20", "--data.use_vl=True",
        "--data.use_cached_embeddings=True",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    records = [json.loads(l) for l in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)


def test_trainer_resume_from_checkpoint(tmp_path):
    """Orbax resume: a second run continues from the saved step."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    from tests.cli_env import make_cli_env

    env = make_cli_env()
    base = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=1", "--lr=1e-3", "--window_size=4",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
        "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
        "--save_model_freq=3",
        f"--checkpoint_dir={ckpt_dir}",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20", "--data.use_vl=True",
        f"--logging.output_dir={out_dir}",
    ]
    p1 = subprocess.run(base + ["--epochs=1"], env=env, capture_output=True, text=True, timeout=900)
    assert p1.returncode == 0, p1.stderr[-3000:]
    assert os.listdir(ckpt_dir)

    p2 = subprocess.run(base + ["--epochs=2"], env=env, capture_output=True, text=True, timeout=900)
    assert p2.returncode == 0, p2.stderr[-3000:]
    assert "resumed from orbax step" in (p2.stderr + p2.stdout)


def test_trainer_cli_instructrl_text(tmp_path):
    """InstructRL: BC + use_text with a from-scratch M3AE over image+text."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")

    from tests.cli_env import make_cli_env

    env = make_cli_env()
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=1", "--lr=1e-3", "--window_size=4",
        "--use_vl=False", "--vl_type=BC", "--use_crop=False", "--game_name=coinrun",
        "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
        "--patch_dim=8", "--encode_image_size=32",
        "--model.model_type=vit_debug", "--model.transfer_type=m3ae_vit_b16",
        "--model.use_from_scratch=True", "--model.use_text=True",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        "--model.m3ae.model_type=custom", "--model.m3ae.emb_dim=32", "--model.m3ae.depth=2",
        "--model.m3ae.num_heads=4", "--model.m3ae.mlp_ratio=2",
        "--model.m3ae.dec_emb_dim=16", "--model.m3ae.dec_depth=1", "--model.m3ae.dec_num_heads=4",
        "--data.tokenizer_max_length=16",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    records = [json.loads(l) for l in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)


def test_trainer_cli_pipeline_parallel(tmp_path):
    """--mesh_pp=2 trains ARPDT with the pipelined policy stack end-to-end."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")

    from tests.cli_env import make_cli_env

    env = make_cli_env()

    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        "--use_vl=True", "--vl_type=clip", "--use_crop=False",
        "--game_name=coinrun", "--val_every_epochs=0", "--test_every_epochs=0",
        "--eval_env=none",
        "--mesh_dp=4", "--mesh_pp=2", "--mesh_pp_microbatches=2",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20", "--data.use_vl=True",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    exp_dirs = os.listdir(out_dir)
    records = [json.loads(line) for line in open(os.path.join(out_dir, exp_dirs[0], "metrics.jsonl"))]
    losses = [r["train_loss"] for r in records if "train_loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)


def test_resolve_goal_eval_data_contract():
    """--eval_with_goal derives the reference's eval-level dataset dir
    (main_procgen.py:342-350) and this repo's data_{split} filename; an
    explicit --eval_data_path always wins."""
    from types import SimpleNamespace

    from arp_tpu.train.common import resolve_goal_eval_data

    flags = SimpleNamespace(
        eval_data_path="", eval_data_name="", eval_with_goal=True,
        game_name="maze", env_distribution_mode="hard", env_start_level=0,
        env_num_levels=500, num_test_episodes=10,
        data=SimpleNamespace(path="./demos", num_frames=8),
        env_eval_env_type="aisc",
    )
    path, name = resolve_goal_eval_data(flags)
    assert path == os.path.join(
        "./demos", "maze_hard_level500to1000_num100_frame8_aisc"
    )
    assert name == "data_train.hdf5"

    flags.eval_data_path = "/explicit/dir"
    flags.eval_data_name = "data_test.hdf5"
    path, name = resolve_goal_eval_data(flags)
    assert path == "/explicit/dir" and name == "data_test.hdf5"

    flags.eval_data_path = ""
    flags.eval_with_goal = False
    path, _ = resolve_goal_eval_data(flags)
    assert path is None


def test_trainer_cli_eval_with_goal(tmp_path):
    """--eval_with_goal end to end: the trainer derives the eval-level dataset
    dir, restores engine states from its traj_state npys, attaches goal
    images, and completes GCBC rollout eval."""
    from arp_tpu.collect.recorder import collect_demonstrations
    from arp_tpu.envs.fake import FakeProcgen

    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)

    # the dir build_test_step derives for these flags:
    # start 0 + num_levels 500 .. 1000, num_test_episodes(1)*10 demos, frame8
    eval_dir = os.path.join(data_root, "coinrun_hard_level500to1000_num10_frame8")
    env = FakeProcgen("coinrun", {"episode_length": 20, "image_size": 32, "grid": 3})
    rng = np.random.default_rng(0)
    collect_demonstrations(
        env, lambda obs: int(rng.integers(0, 4)),
        os.path.join(eval_dir, "data_train.hdf5"),
        num_episodes=2, game_name="coinrun", num_frames=8, seed=0,
    )

    from tests.cli_env import make_cli_env

    out_dir = str(tmp_path / "out")
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        "--use_vl=False", "--vl_type=GCBC", "--use_crop=False",
        "--game_name=coinrun", "--val_every_epochs=0",
        "--test_every_epochs=1", "--num_test_episodes=1", "--episode_length=10",
        "--eval_env=fake", "--eval_with_goal=True",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=make_cli_env(), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    records = [
        json.loads(line)
        for line in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))
    ]
    assert any("test/return" in r for r in records), "goal-conditioned eval never ran"


def test_build_test_step_selects_clip_ft_engine(monkeypatch, tmp_path):
    """--vl_type=clip_ft + --vl_checkpoint builds the fine-tuned adapter
    engine (regression: eval silently used base CLIP while training labels
    came from the adapter)."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from arp_tpu.train import common as tc

    built = {}

    class FakeFt:
        def __init__(self, adapter_params, **kw):
            built["ft"] = adapter_params

    import arp_tpu.finetune.reward as ftr

    monkeypatch.setattr(ftr, "ClipFtRewardEngine", FakeFt)
    monkeypatch.setattr(ftr, "load_adapter_params", lambda p: {"loaded_from": p})

    flags = SimpleNamespace(
        model=SimpleNamespace(transfer_type="none"),
        episode_length=5, env_eval_env_type="none", env_distribution_mode="hard",
        env_num_levels=5, env_start_level=0, eval_env="fake", game_name="coinrun",
        use_vl=True, vl_type="clip_ft", vl_checkpoint=str(tmp_path / "adapter"),
        use_crop=False, reward_bf16=False, num_test_episodes=1, window_size=2,
        return_to_go=10.0, eval_data_path="", eval_data_name="", eval_with_goal=False,
        data=SimpleNamespace(inst_type="none", use_normalize=False, num_frames=4, path="."),
    )

    class DS:
        return_to_go = 10.0
        scale = 10.0
        reward_min = 0.0

        def tokenizer(self, text):
            return np.zeros(8, np.int32), np.ones(8, np.float32)

    class M:
        def apply(self, *a, **k):
            return jnp.zeros((1,), jnp.int32)

        greedy_action = apply

    step = tc.build_test_step(flags, M(), DS(), lambda x: x, use_text=False)
    assert built.get("ft") == {"loaded_from": str(tmp_path / "adapter")}
    assert callable(step)


def test_trainer_cli_eval_parallel_envs(tmp_path):
    """--eval_parallel_envs switches eval to the batched lockstep
    parallel_rollout (VERDICT r2 item 4), including the goal-conditioned
    path: engine state restore per env, goal images fed to the policy, and
    wave handling when num_test_episodes % eval_parallel_envs != 0."""
    from arp_tpu.collect.recorder import collect_demonstrations
    from arp_tpu.envs.fake import FakeProcgen

    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)

    eval_dir = os.path.join(data_root, "coinrun_hard_level500to1000_num30_frame8")
    env = FakeProcgen("coinrun", {"episode_length": 20, "image_size": 32, "grid": 3})
    rng = np.random.default_rng(0)
    collect_demonstrations(
        env, lambda obs: int(rng.integers(0, 4)),
        os.path.join(eval_dir, "data_train.hdf5"),
        num_episodes=4, game_name="coinrun", num_frames=8, seed=0,
    )

    from tests.cli_env import make_cli_env

    out_dir = str(tmp_path / "out")
    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        "--use_vl=False", "--vl_type=GCBC", "--use_crop=False",
        "--game_name=coinrun", "--val_every_epochs=0",
        "--test_every_epochs=1", "--num_test_episodes=3", "--episode_length=10",
        "--eval_parallel_envs=2",
        "--eval_env=fake", "--eval_with_goal=True",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20",
        f"--logging.output_dir={out_dir}",
    ]
    proc = subprocess.run(cmd, env=make_cli_env(), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    records = [
        json.loads(line)
        for line in open(os.path.join(out_dir, os.listdir(out_dir)[0], "metrics.jsonl"))
    ]
    test_recs = [r for r in records if "test/return" in r]
    assert test_recs, "parallel eval never ran"
    assert "test/success_rate" in test_recs[-1]  # parallel_rollout's extra metric


def test_trainer_fault_rollback_and_heartbeat(tmp_path):
    """VERDICT r2 item 5: a NaN batch injected mid-training is detected, the
    trainer restores the last orbax checkpoint and finishes cleanly
    (fault_policy=rollback); the heartbeat file advances.  With
    fault_policy=halt the same injection exits non-zero."""
    from tests.cli_env import make_cli_env

    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")
    ckpt_dir = str(tmp_path / "ckpt")

    def cmd(policy, out, ckpt):
        return [
            sys.executable, "-m", "arp_tpu.train.main",
            "--epochs=4", "--warmup_epochs=0", "--batch_size=8",
            "--dataloader_n_workers=0", "--log_freq=2", "--lr=1e-3",
            "--window_size=4", "--use_vl=True", "--vl_type=clip", "--use_crop=False",
            "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
            "--save_model_freq=2", f"--checkpoint_dir={ckpt}",
            f"--fault_policy={policy}", "--fault_inject_step=5",
            "--heartbeat_interval=0.0",
            "--model.model_type=vit_debug", "--model.transfer_type=none",
            "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
            "--model.mlp_ratio=2",
            f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
            "--data.window_size=4", "--data.use_vl=True", "--data.num_demonstrations=20",
            f"--logging.output_dir={out}",
        ]

    proc = subprocess.run(
        cmd("rollback", out_dir, ckpt_dir),
        env=make_cli_env(), capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
    records = [json.loads(line) for line in open(os.path.join(run_dir, "metrics.jsonl"))]
    faulted = [r for r in records if r.get("fault") == "nan"]
    assert faulted, "NaN injection was never detected"
    assert faulted[0].get("rolled_back_to", -1) >= 0, faulted[0]
    # training continued past the fault with finite losses
    later = [r for r in records if "train_loss" in r and r.get("step", 0) > faulted[0]["step"]]
    assert later and all(np.isfinite(r["train_loss"]) for r in later), later
    assert any("final_step" in r for r in records), "trainer did not finish"
    # heartbeat ADVANCED (interval 0 -> every step writes "time step"):
    # existence alone would be satisfied by the single step-0 beat
    hb = open(os.path.join(run_dir, "heartbeat")).read().split()
    assert int(hb[1]) > 0, hb

    proc = subprocess.run(
        cmd("halt", str(tmp_path / "out2"), str(tmp_path / "ckpt2")),
        env=make_cli_env(), capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode != 0, "halt policy must exit non-zero"
    assert "fault detector" in proc.stderr


def test_trainer_profile_trace_cli(tmp_path):
    """--profile_dir captures an XLA trace (tensorboard trace-viewer files)
    for the configured step window during a real CLI run."""
    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    out_dir = str(tmp_path / "out")
    trace_dir = str(tmp_path / "trace")

    from tests.cli_env import make_cli_env

    cmd = [
        sys.executable, "-m", "arp_tpu.train.main",
        "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
        "--log_freq=2", "--lr=1e-3", "--window_size=4",
        "--use_vl=False", "--vl_type=BC", "--use_crop=False",
        "--game_name=coinrun", "--val_every_epochs=0", "--test_every_epochs=0",
        "--eval_env=none",
        "--model.model_type=vit_debug", "--model.transfer_type=none",
        "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
        "--model.mlp_ratio=2", "--model.num_ensembles=2",
        f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
        "--data.window_size=4", "--data.num_demonstrations=20",
        f"--logging.output_dir={out_dir}",
        f"--profile_dir={trace_dir}", "--profile_start_step=1", "--profile_steps=2",
    ]
    proc = subprocess.run(cmd, env=make_cli_env(), capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-4000:]}"
    # the profiler writes plugins/profile/<run>/ with .trace.json.gz /.xplane.pb
    written = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir) for f in fs]
    assert written, "profiler produced no trace files"


def test_trainer_cli_frozen_m3ae_frozen_bf16(tmp_path):
    """Frozen (pretrained) m3ae through the real loader; frozen_bf16 pins the
    full-bf16 recipe's first-step loss to the fp32 run within 1%."""
    import pickle

    import numpy as np

    from arp_tpu.models.m3ae import export_reference_m3ae_params
    from test_m3ae_export import _tiny_model_and_params
    from tests.cli_env import make_cli_env

    data_root = str(tmp_path / "demos")
    make_labeled_dataset(data_root)
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir)
    _, params, _ = _tiny_model_and_params()
    with open(os.path.join(ckpt_dir, "m3ae_base_params.pkl"), "wb") as f:
        pickle.dump(export_reference_m3ae_params(params), f)

    env = make_cli_env()
    env["ARP_TPU_CHECKPOINT_DIR"] = ckpt_dir

    def run(extra, tag):
        out_dir = str(tmp_path / f"out_{tag}")
        cmd = [
            sys.executable, "-m", "arp_tpu.train.main",
            "--epochs=1", "--warmup_epochs=0", "--batch_size=8", "--dataloader_n_workers=0",
            "--log_freq=1", "--lr=1e-3", "--window_size=4",
            "--use_vl=True", "--vl_type=clip", "--use_crop=False", "--game_name=coinrun",
            "--val_every_epochs=0", "--test_every_epochs=0", "--eval_env=none",
            "--patch_dim=8", "--encode_image_size=32",
            "--model.model_type=vit_debug", "--model.transfer_type=m3ae_vit_b16",
            "--model.use_from_scratch=False",
            "--model.emb_dim=32", "--model.depth=2", "--model.num_heads=4",
            "--model.mlp_ratio=2", "--model.num_ensembles=2",
            "--model.m3ae.model_type=custom", "--model.m3ae.emb_dim=32",
            "--model.m3ae.depth=2", "--model.m3ae.num_heads=4", "--model.m3ae.mlp_ratio=2",
            "--model.m3ae.dec_emb_dim=16", "--model.m3ae.dec_depth=1",
            "--model.m3ae.dec_num_heads=4",
            f"--data.path={data_root}", "--data.image_size=32", "--data.num_frames=8",
            "--data.window_size=4", "--data.num_demonstrations=20", "--data.use_vl=True",
            f"--logging.output_dir={out_dir}",
        ] + extra
        p = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
        assert p.returncode == 0, p.stderr[-4000:]
        run_dir = os.path.join(out_dir, os.listdir(out_dir)[0])
        recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        return [r["train_loss"] for r in recs if "train_loss" in r]

    l_base = run([], "fp32")
    l_fast = run(["--model.frozen_bf16=True"], "fbf16")
    assert l_base and l_fast
    assert all(np.isfinite(l_fast))
    rel = abs(l_fast[0] - l_base[0]) / (abs(l_base[0]) + 1e-9)
    assert rel < 0.01, (l_base[0], l_fast[0])
