"""Demo collection CLI — ``python -m arp_tpu.collect.collect``.

Equivalent of the reference's ``python -m collect_procgen_data``
(data/PPG/collect_procgen_data.py): roll a trained PPG policy, record
high-resolution frames + engine states into the framework's HDF5 demo
schema, with per-game expert filtering and optional random-action
corruption.  The dual-resolution state-sync trick is available for the real
engine (policy on low-res obs, recorder on high-res) via --dual_res.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from absl import app, flags

from ..config import define_flags_with_default
from .ppg import PhasicValueModel
from .recorder import collect_demonstrations

FLAGS_DEF = define_flags_with_default(
    seed=42,
    game_name="coinrun",
    model_path="",
    num_episodes=500,
    num_frames=8,
    split="train",
    out_dir="./demonstrations",
    distribution_mode="hard",
    num_levels=500,
    start_level=0,
    env_type="none",
    random_action_prob=0.0,
    enable_filter=True,
    fake_env=False,
    dual_res=True,
    episode_length=1000,
    # dirname key: how many demos the TRAIN split holds. The dirname must be
    # identical across splits (train/val live in one directory), so val
    # collection passes --num_episodes=50 --num_demonstrations=500.
    # 0 -> use num_episodes (the train-split default).
    num_demonstrations=0,
)

FLAGS = flags.FLAGS


def main(argv):
    del argv
    from ..data.procgen_dataset import dataset_dirname

    dirname = dataset_dirname(
        FLAGS.game_name,
        distribution_mode=FLAGS.distribution_mode,
        start_level=FLAGS.start_level,
        num_levels=FLAGS.num_levels,
        num_demonstrations=FLAGS.num_demonstrations or FLAGS.num_episodes,
        num_frames=FLAGS.num_frames,
        enable_filter=FLAGS.enable_filter,
        env_type=FLAGS.env_type,
    )
    data_path = os.path.join(FLAGS.out_dir, dirname, f"data_{FLAGS.split}.hdf5")

    # policy: trained PPG params (JAX pickle or a reference torch .jd
    # expert), or a random policy when none given
    if FLAGS.model_path and FLAGS.model_path.endswith(".jd"):
        from .convert_ppg import load_reference_ppg_expert

        model, variables = load_reference_ppg_expert(FLAGS.model_path)
        params = variables["params"]
    elif FLAGS.model_path:
        from ..checkpoint import load_pickle

        data = load_pickle(FLAGS.model_path)
        params = data["params"] if isinstance(data, dict) and "params" in data else data
        model = PhasicValueModel(num_actions=15)
    else:
        params = None
    if FLAGS.model_path:

        @jax.jit
        def act(frames):
            logits, _, _ = model.apply({"params": params}, frames)
            return logits.argmax(-1)

        image_key = "ob"

        def policy_fn(obs):
            frame = np.asarray(obs["image"][image_key], np.float32)[None] / 255.0
            return int(np.asarray(act(jnp.asarray(frame)))[0])
    else:
        rng = np.random.default_rng(FLAGS.seed)

        def policy_fn(obs):
            return int(rng.integers(0, 15))

    env_conf = {
        "episode_length": FLAGS.episode_length,
        "distribution_mode": FLAGS.distribution_mode,
        "num_levels": FLAGS.num_levels,
        "start_level": FLAGS.start_level,
        "use_train_levels": True,
        # the collected env variant must match the dirname suffix — the
        # reference passes env_type into the env too (collect_procgen_data.py:162)
        "eval_env_type": FLAGS.env_type,
    }
    paired = None
    if FLAGS.fake_env:
        from ..envs.fake import FakeProcgen

        env = FakeProcgen(FLAGS.game_name, {"episode_length": FLAGS.episode_length})
    else:
        from ..envs.procgen import Procgen

        env = Procgen(FLAGS.game_name, env_conf, image_resolution="high")
        if FLAGS.dual_res:
            paired = Procgen(FLAGS.game_name, env_conf, image_resolution="low")

    rec = collect_demonstrations(
        env,
        policy_fn,
        data_path,
        num_episodes=FLAGS.num_episodes,
        game_name=FLAGS.game_name,
        num_frames=FLAGS.num_frames,
        success_filter=FLAGS.enable_filter,
        seed=FLAGS.seed,
        random_action_prob=FLAGS.random_action_prob,
        paired_policy_env=paired,
        # reference keeps T < 1000 (trajectory_recorder.py:127); the cap
        # tracks the actual timeout in BOTH directions so timeout-truncated
        # episodes stay excluded from EXPERT demos for any --episode_length.
        # With --enable_filter=False (debug/unfiltered collection) timeout
        # episodes are deliberately kept — otherwise nothing could ever be
        # recorded without a success.
        max_episode_length=(
            FLAGS.episode_length if FLAGS.enable_filter else FLAGS.episode_length + 1
        ),
    )
    print(f"[DONE] recorded {rec.num_recorded} episodes ({rec.num_filtered} filtered) -> {data_path}")


if __name__ == "__main__":
    app.run(main)
