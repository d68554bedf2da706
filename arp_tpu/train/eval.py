"""Standalone evaluation driver — ``python -m arp_tpu.train.eval``.

Parity with the reference's ``python -m arp_dt.local_run_procgen``: loads a
checkpoint (orbax dir or reference pickle), rebuilds the model and the
dataset (to recover return_to_go / scale), runs rollout evaluation with
on-the-fly CLIP rewards, and logs returns + videos.
"""

from __future__ import annotations

import jax
from absl import app, flags, logging as absl_logging
from flax.training.train_state import TrainState

from ..config import define_flags_with_default, get_user_flags
from ..data.procgen_dataset import ProcgenDataset, dataset_dirname
from ..logging_utils import MetricsLogger
from ..models.policy import get_policy_default_config
from ..ops.augment import make_eval_transform
from ..rng import next_rng, set_random_seed

FLAGS_DEF = define_flags_with_default(
    seed=42,
    load_checkpoint="",
    checkpoint_dir="",
    batch_size=2,
    weight_decay=1e-4,
    clip_gradient=1e9,
    window_size=4,
    use_text=False,
    num_test_episodes=100,
    # >1: batched lockstep eval via parallel_rollout (waves of N envs)
    eval_parallel_envs=0,
    # 0.0 = greedy decode (reference parity); >0 = seeded temperature
    # sampling (BasePolicy.sample_action) — required for method-ordering
    # experiments where collapsed greedy policies tie bit-identically
    eval_temperature=0.0,
    # conditioning-sensitivity probe: pair episode ep's initial state with
    # episode (ep+shift)'s goal frame (parallel eval path only)
    eval_goal_shift=0,
    return_to_go=0.0,
    scale=10.0,
    game_name="coinrun",
    use_vl=True,
    vl_type="clip",
    vl_checkpoint="",
    use_crop=True,
    eval_data_path="",
    eval_data_name="",  # filename inside eval_data_path (default data_train.hdf5)
    eval_with_goal=False,
    eval_instruct="",  # override the eval reward instruction text
    episode_length=500,
    eval_env="fake",
    env_eval_env_type="none",
    env_distribution_mode="hard",
    env_num_levels=500,
    env_start_level=0,
    env_hidden_goal=False,  # fake-env only (see train/main.py)
    reward_bf16=False,
    patch_dim=16,
    encode_image_size=0,
    logging=MetricsLogger.get_default_config(),
    model=get_policy_default_config(),
    data=ProcgenDataset.get_default_config(),
)

FLAGS = flags.FLAGS


def main(argv):
    del argv
    from .common import build_model, build_test_step

    variant = get_user_flags(FLAGS, FLAGS_DEF)
    set_random_seed(FLAGS.seed)
    logger = MetricsLogger(config=FLAGS.logging, variant=variant)

    FLAGS.model.use_discrete_action = True

    dataset_name = dataset_dirname(
        FLAGS.game_name,
        FLAGS.env_distribution_mode,
        FLAGS.env_start_level,
        FLAGS.env_num_levels,
        FLAGS.data.num_demonstrations,
        FLAGS.data.num_frames,
        FLAGS.data.enable_filter,
        FLAGS.data.train_env_type,
    )
    train_dataset = ProcgenDataset(update=FLAGS.data, dataset_name=dataset_name, split="train")
    frozen_qpack = None
    if FLAGS.model.get("frozen_int8", False):
        # calibrate on a small training batch (same frames distribution the
        # rollout sees; the pack's margin covers the env/eval jitter)
        from .common import _host_batch_to_arrays, maybe_build_frozen_qpack
        from ..data.loader import DataLoader

        use_goal = "GCBC" in FLAGS.vl_type
        loader = DataLoader(train_dataset, batch_size=min(8, len(train_dataset)),
                            shuffle=False, num_workers=0, seed=FLAGS.seed)
        sample = _host_batch_to_arrays(next(iter(loader)), FLAGS.use_text, use_goal)
        # prefer the scales the TRAINING run saved (same frozen-tower
        # numerics as the checkpoint); recalibrate only when absent
        frozen_qpack = maybe_build_frozen_qpack(
            FLAGS, sample, use_goal, checkpoint_dir=FLAGS.checkpoint_dir
        )
    model = build_model(FLAGS, train_dataset.num_actions, frozen_qpack=frozen_qpack)

    # restore params
    if FLAGS.load_checkpoint:
        from ..checkpoint import load_reference_checkpoint

        data = load_reference_checkpoint(FLAGS.load_checkpoint)
        params = data["state"].params if hasattr(data["state"], "params") else data["state"]["params"]
    elif FLAGS.checkpoint_dir:
        from ..checkpoint import CheckpointManager
        from .common import build_optimizer, get_dummy_input

        dummy = get_dummy_input(FLAGS, train_dataset)
        init_rngs = {"params": next_rng(), "noise": next_rng(), "dropout": next_rng()}
        params0 = jax.jit(lambda r, d: model.init(r, d, deterministic=True))(init_rngs, dummy)["params"]
        # the template optimizer must mirror the trainer's chain (incl. a
        # *schedule* LR — constants produce a different opt_state pytree)
        import optax

        tx = build_optimizer(FLAGS, optax.constant_schedule(1e-3), model)
        template = TrainState.create(apply_fn=model.apply, params=params0, tx=tx)
        ckpt = CheckpointManager(FLAGS.checkpoint_dir)
        state, _ = ckpt.restore(jax.device_get(template))
        params = state.params
    else:
        raise ValueError("pass --load_checkpoint (pickle) or --checkpoint_dir (orbax)")

    import optax

    gstate = TrainState.create(apply_fn=model.apply, params=params, tx=optax.identity())

    transfer = FLAGS.model.transfer_type
    image_size = 224 if transfer.startswith("clip") else 256
    if transfer == "none":
        image_size = FLAGS.data.image_size
    if FLAGS.encode_image_size > 0:
        # must match the trainer's --encode_image_size or restored
        # positional-embedding shapes will not fit the rollout inputs
        image_size = FLAGS.encode_image_size
    eval_transform = make_eval_transform(image_size=image_size)

    test_step_fn = build_test_step(FLAGS, model, train_dataset, eval_transform, FLAGS.use_text)
    if test_step_fn is None:
        raise SystemExit(
            "cannot rollout-eval a cached-embedding policy "
            f"(transfer_type={FLAGS.model.transfer_type}): no live encoder "
            "for env frames — evaluate the live-encoder equivalent instead"
        )
    metric, info, videos = test_step_fn(gstate, next_rng())

    logged = {f"eval/{k}": float(v) for k, v in metric.items()}
    logger.log(logged)
    absl_logging.info("eval metrics: %s", logged)
    for i, video in enumerate(videos[:5]):
        logger.log_video(f"media/eval_rollout_{i}", video)
    logger.close()
    print({k: float(v) for k, v in metric.items()})


if __name__ == "__main__":
    app.run(main)
