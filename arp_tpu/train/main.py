"""Policy trainer — ``python -m arp_tpu.train.main``.

TPU-native re-design of the reference trainer (arp_dt/main_procgen.py):

  * pmap+replicate -> jit over a dp/fsdp/tp `Mesh` (GSPMD collectives);
  * torch DataLoader -> thread-prefetched numpy loader + mesh sharder;
  * host-side augmax pmap -> augmentation fused INTO the jitted train step
    (uint8 crosses the PCIe/ICI link, floats never do);
  * torch CLIP eval rewards -> the same JAX reward engine as the labeler;
  * cloudpickle checkpoints -> Orbax (async, sharded, resumable);
  * HLO FLOPs analysis via jitted-lowering cost analysis.

The flag surface mirrors the reference CLI (same names/defaults) plus mesh
and precision controls.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags, logging as absl_logging
from flax.training.train_state import TrainState

from ..config import define_flags_with_default, get_user_flags
from ..checkpoint import CheckpointManager
from ..data.loader import DataLoader
from ..data.procgen_dataset import ProcgenDataset, dataset_dirname
from ..data.instructions import get_clip_instruct, get_clip_special_instruct, get_m3ae_instruct
from ..logging_utils import MetricsLogger
from ..models.policy import ARPDT, BC, GCBC, get_policy_default_config
from ..ops.augment import make_augment_fn, make_eval_transform
from ..parallel import MeshConfig, create_mesh, make_train_step, shard_batch
from ..parallel.mesh import partition_params
from ..parallel.prefetch import ThreadedPrefetch
from ..parallel.step import make_eval_step, shard_train_state
from ..rng import next_rng, set_random_seed

FLAGS_DEF = define_flags_with_default(
    seed=42,
    epochs=100,
    warmup_epochs=5.0,
    weight_decay=1e-4,
    batch_size=2,
    dataloader_n_workers=4,
    dataloader_shuffle=True,
    log_freq=100,
    save_model_freq=0,
    load_checkpoint="",
    lr=0.1,
    lr_schedule="cos",
    momentum=0.9,
    clip_gradient=1e9,
    auto_scale_lr=False,
    logging=MetricsLogger.get_default_config(),
    log_all_worker=False,
    model=get_policy_default_config(),
    data=ProcgenDataset.get_default_config(),
    window_size=4,
    use_text=False,
    val_every_epochs=10,
    test_every_epochs=10,
    num_test_episodes=5,
    return_to_go=0.0,
    scale=10.0,
    game_name="coinrun",
    use_vl=True,
    vl_type="clip",
    vl_checkpoint="",
    use_crop=True,
    eval_data_path="",
    eval_with_goal=False,
    # --- TPU-native additions ---
    mesh_dp=-1,
    mesh_fsdp=1,
    mesh_tp=1,
    accum_steps=1,
    checkpoint_dir="",
    episode_length=500,
    eval_env="fake",  # fake | procgen | none
    env_eval_env_type="none",
    env_distribution_mode="hard",
    env_num_levels=500,
    env_start_level=0,
    reward_bf16=False,
    patch_dim=16,
)

FLAGS = flags.FLAGS


def build_model(flags_obj, num_actions: int):
    if flags_obj.use_vl or flags_obj.data.use_task_reward:
        cls = ARPDT
    elif "GCBC" in flags_obj.vl_type:
        cls = GCBC
    else:
        cls = BC
    return cls(
        config_updates=flags_obj.model,
        num_actions=num_actions,
        patch_dim=flags_obj.patch_dim,
        normalize_quterion=False,
    )


def build_lr_schedule(flags_obj, steps_per_epoch: int, total_steps: int, lr_scale: float = 1.0):
    if flags_obj.lr_schedule == "fixed":
        return optax.linear_schedule(flags_obj.lr, flags_obj.lr, total_steps)
    if flags_obj.lr_schedule == "cos":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=flags_obj.lr * lr_scale,
            warmup_steps=int(flags_obj.warmup_epochs * steps_per_epoch),
            decay_steps=total_steps,
            end_value=0.0,
        )
    if flags_obj.lr_schedule == "cos_decay":
        return optax.cosine_decay_schedule(flags_obj.lr, total_steps)
    raise ValueError(f"Unsupported lr schedule {flags_obj.lr_schedule!r}")


def build_optimizer(flags_obj, learning_rate, model):
    """clip_by_global_norm + adamw with no-decay mask (main_procgen.py:490-507)."""

    def weight_decay_mask(params):
        import flax

        flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))

        def decay(path):
            return not any(nd in k for nd in model.no_decay_list() for k in path)

        return flax.traverse_util.unflatten_dict({p: decay(p) for p in flat})

    return optax.chain(
        optax.clip_by_global_norm(flags_obj.clip_gradient),
        optax.adamw(
            learning_rate=learning_rate,
            weight_decay=flags_obj.weight_decay,
            b1=0.9,
            b2=0.999,
            mask=weight_decay_mask,
        ),
    )


def get_dummy_input(flags_obj, dataset):
    window = flags_obj.window_size
    transfer = flags_obj.model.transfer_type
    image_size = 224 if transfer.startswith("clip") else 256
    if transfer == "none":
        image_size = flags_obj.data.image_size
    dummy = {
        "action": jnp.ones((1, window), jnp.int32),
        "image": {},
        "goal": {},
        "rtg": {},
        "instruct": None,
        "text_padding_mask": None,
    }
    for k in dataset.obs_shape["image"]:
        dummy["image"][k] = jnp.ones((1, window, image_size, image_size, 3), jnp.float32)
        dummy["goal"][k] = jnp.ones((1, window, image_size, image_size, 3), jnp.float32)
        dummy["rtg"][k] = jnp.ones((1, window, 1), jnp.float32)
    if dataset.config.state_key != "":
        dummy["state"] = jnp.ones((1, window, dataset.config.state_dim), jnp.float32)
    if flags_obj.use_text:
        dummy["instruct"] = jnp.zeros((1, flags_obj.data.tokenizer_max_length), jnp.int32)
        dummy["text_padding_mask"] = jnp.ones((1, flags_obj.data.tokenizer_max_length), jnp.float32)
    return dummy


def flops_analysis(jitted, *args):
    try:
        lowered = jitted.lower(*args)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", -1.0))
    except Exception:
        return -1.0


def make_loss_fn(model, augment_fn, image_size: int, use_goal: bool):
    """Loss with on-device augmentation fused into the step."""

    def loss_fn(params, batch, rng):
        rng, aug_rng = jax.random.split(rng)
        batch = dict(batch)
        if augment_fn is not None:
            def aug_tree(images, rng):
                out = {}
                for i, (k, v) in enumerate(sorted(images.items())):
                    b, w = v.shape[:2]
                    flat = v.reshape((b * w,) + v.shape[2:])
                    auged, _ = augment_fn(flat, jax.random.fold_in(rng, i))
                    out[k] = auged.reshape((b, w) + auged.shape[1:])
                return out

            batch["image"] = aug_tree(batch["image"], aug_rng)
            if use_goal and batch.get("goal") is not None:
                batch["goal"] = aug_tree(batch["goal"], jax.random.fold_in(aug_rng, 977))
        output = model.apply(
            {"params": params},
            batch,
            rngs={"dropout": rng, "noise": jax.random.fold_in(rng, 1)},
            deterministic=False,
        )
        aux = {
            "loss": output["loss"],
            "acc": output["acc"] * 100,
            "trans_loss": output.get("trans_loss", 0.0),
            "return_loss": output.get("return_loss", 0.0),
        }
        return output["loss"], aux

    return loss_fn


def make_eval_loss_fn(model, eval_transform, use_goal: bool):
    def loss_fn(params, batch, rng):
        batch = dict(batch)
        if eval_transform is not None:
            def tr(images):
                out = {}
                for k, v in images.items():
                    b, w = v.shape[:2]
                    flat = v.reshape((b * w,) + v.shape[2:])
                    t = eval_transform(flat)
                    out[k] = t.reshape((b, w) + t.shape[1:])
                return out

            batch["image"] = tr(batch["image"])
            if use_goal and batch.get("goal") is not None:
                batch["goal"] = tr(batch["goal"])
        output = model.apply(
            {"params": params}, batch, rngs={"dropout": rng}, deterministic=True
        )
        aux = {
            "loss": output["loss"],
            "acc": output["acc"] * 100,
            "trans_loss": output.get("trans_loss", 0.0),
            "return_loss": output.get("return_loss", 0.0),
        }
        return output["loss"], aux

    return loss_fn


def main(argv):
    del argv
    variant = get_user_flags(FLAGS, FLAGS_DEF)
    absl_logging.info("JAX process: %d / %d", jax.process_index(), jax.process_count())
    absl_logging.info("JAX devices: %r", jax.devices())

    process_index, process_count = jax.process_index(), jax.process_count()
    assert FLAGS.batch_size % process_count == 0
    process_batch_size = FLAGS.batch_size // process_count
    variant.update(
        jax_process_index=process_index,
        jax_process_count=process_count,
        process_batch_size=process_batch_size,
    )
    lr_scale = FLAGS.batch_size / 256 if FLAGS.auto_scale_lr else 1.0

    FLAGS.model.use_discrete_action = True
    use_text = FLAGS.use_text
    if not FLAGS.use_vl and FLAGS.vl_type == "BC":
        use_text = True  # InstructRL baseline

    logger = MetricsLogger(
        config=FLAGS.logging,
        variant=variant,
        enable=FLAGS.log_all_worker or (process_index == 0),
    )
    set_random_seed(FLAGS.seed * (process_index + 1))

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

    train_dataset = ProcgenDataset(
        update=FLAGS.data,
        dataset_name=dataset_name,
        start_offset_ratio=process_index / process_count,
        split="train",
    )
    val_dataset = ProcgenDataset(
        update=FLAGS.data,
        dataset_name=dataset_name,
        start_offset_ratio=process_index / process_count,
        split="val",
    )
    train_loader = DataLoader(
        train_dataset,
        batch_size=process_batch_size,
        shuffle=FLAGS.dataloader_shuffle,
        num_workers=FLAGS.dataloader_n_workers,
        seed=FLAGS.seed,
    )
    val_batch_size = max(1, min(process_batch_size, len(val_dataset) // max(process_count, 1)))
    val_loader = DataLoader(
        val_dataset,
        batch_size=val_batch_size,
        shuffle=FLAGS.dataloader_shuffle,
        num_workers=FLAGS.dataloader_n_workers,
        seed=FLAGS.seed + 1,
    )

    steps_per_epoch = max(1, len(train_dataset) // FLAGS.batch_size)
    total_steps = steps_per_epoch * FLAGS.epochs
    val_steps = max(1, len(val_dataset) // val_batch_size)
    save_model_freq = FLAGS.save_model_freq or steps_per_epoch * FLAGS.test_every_epochs

    model = build_model(FLAGS, train_dataset.num_actions)
    use_goal = "GCBC" in FLAGS.vl_type
    learning_rate = build_lr_schedule(FLAGS, steps_per_epoch, total_steps, lr_scale)
    tx = build_optimizer(FLAGS, learning_rate, model)

    dummy_input = get_dummy_input(FLAGS, train_dataset)
    if use_text:
        tokenizer = train_dataset.tokenizer
        ids, pad = tokenizer(get_m3ae_instruct(FLAGS.game_name) or "")
        dummy_input["instruct"] = jnp.asarray(ids)[None]
        dummy_input["text_padding_mask"] = jnp.asarray(pad)[None]

    init_rngs = {"params": next_rng(), "noise": next_rng(), "dropout": next_rng()}
    params = jax.jit(partial(model.init, deterministic=True))(init_rngs, dummy_input)["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = create_mesh(MeshConfig(dp=FLAGS.mesh_dp, fsdp=FLAGS.mesh_fsdp, tp=FLAGS.mesh_tp))
    absl_logging.info("mesh: %s", mesh)

    ckpt = None
    start_step = 0
    if FLAGS.checkpoint_dir:
        ckpt = CheckpointManager(FLAGS.checkpoint_dir)
    if FLAGS.load_checkpoint:
        from ..checkpoint import load_reference_checkpoint

        data = load_reference_checkpoint(FLAGS.load_checkpoint)
        state = state.replace(params=data["state"].params, step=data["state"].step)
        start_step = data["step"]
    elif ckpt is not None and ckpt.latest_step() is not None:
        state, meta = ckpt.restore(state)
        start_step = int(meta.get("step", int(state.step)))
        absl_logging.info("resumed from orbax step %d", start_step)

    if process_index == 0:
        num_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
        logger.log({"cost/num_params": num_params})
        absl_logging.info("num_params: %d", num_params)

    # augmentation (fused into the train step)
    transfer = FLAGS.model.transfer_type
    image_size = 224 if transfer.startswith("clip") else 256
    if transfer == "none":
        image_size = FLAGS.data.image_size
    augment_fn = make_augment_fn(
        FLAGS.data.augmentations, image_size=image_size, source_size=FLAGS.data.image_size
    )
    eval_transform = make_eval_transform(image_size=image_size)

    loss_fn = make_loss_fn(model, augment_fn, image_size, use_goal)
    eval_loss_fn = make_eval_loss_fn(model, eval_transform, use_goal)

    with mesh:
        train_step = make_train_step(
            loss_fn,
            mesh,
            weight_decay=0.0,  # decoupled adamw handles wd (reference also adds
            # an explicit L2 penalty; enable via weight_decay= to match exactly)
            learning_rate_fn=learning_rate,
            accum_steps=FLAGS.accum_steps,
        )
        eval_step = make_eval_step(eval_loss_fn)
        gstate = shard_train_state(state, mesh)

        if process_index == 0:
            gb = shard_batch(_host_batch_to_arrays(next(iter(train_loader)), use_text, use_goal), mesh)
            flops = flops_analysis(train_step, gstate, gb, jax.random.PRNGKey(0))
            logger.log({"cost/flops": flops})

        # eval setup
        test_step_fn = None
        if FLAGS.eval_env != "none":
            test_step_fn = build_test_step(FLAGS, model, train_dataset, eval_transform, use_text)

        train_iter = ThreadedPrefetch(
            (shard_batch(_host_batch_to_arrays(b, use_text, use_goal), mesh) for b in train_loader.epochs()),
            capacity=2,
        )
        rng = jax.random.PRNGKey(FLAGS.seed)

        best_eval_score = -np.inf
        train_metrics = []
        for step in range(start_step, total_steps):
            batch = next(train_iter)
            epoch = step // steps_per_epoch
            rng, step_rng = jax.random.split(rng)
            gstate, aux = train_step(gstate, batch, step_rng)
            train_metrics.append(aux)

            if step and step % FLAGS.log_freq == 0:
                logged = _mean_metrics(train_metrics, prefix="train_")
                logged.update(step=step, epoch=epoch)
                logger.log(logged)
                train_metrics = []

            if (
                FLAGS.val_every_epochs > 0
                and step > 0
                and step % (FLAGS.val_every_epochs * steps_per_epoch) == 0
            ):
                val_metrics = []
                for _, vb in zip(range(val_steps), val_loader):
                    vb = shard_batch(_host_batch_to_arrays(vb, use_text, use_goal), mesh)
                    val_metrics.append(eval_step(gstate, vb, step_rng))
                logged = _mean_metrics(val_metrics, prefix="val_")
                logged.update(step=step, epoch=epoch)
                logger.log(logged)

            if (
                test_step_fn is not None
                and FLAGS.test_every_epochs > 0
                and step > 0
                and (step % (FLAGS.test_every_epochs * steps_per_epoch) == 0 or step == total_steps - 1)
            ):
                metric, info, videos = test_step_fn(gstate, next_rng())
                logged = {f"test/{k}": float(v) for k, v in metric.items()}
                logged.update(step=step, epoch=epoch)
                logger.log(logged)
                if videos:
                    logger.log_video(f"media/test_step{step}", videos[0])
                score = float(metric["return"])
                if ckpt is not None:
                    ckpt.save_best(step, jax.device_get(gstate), score, metadata={"step": step})
                best_eval_score = max(best_eval_score, score)

            if ckpt is not None and step and (step % save_model_freq == 0 or step == total_steps - 1):
                ckpt.save(step, jax.device_get(gstate), metadata={"step": step, "epoch": epoch})

        if ckpt is not None:
            ckpt.wait()
    logger.log({"final_step": total_steps, "best_eval_score": float(best_eval_score)})
    logger.close()


def _host_batch_to_arrays(batch, use_text: bool, use_goal: bool = False):
    """Strip unused entries so no dead bytes cross the host->HBM link."""
    out = dict(batch)
    if not use_text:
        out["instruct"] = None
        out["text_padding_mask"] = None
    if not use_goal:
        out["goal"] = None
    return out


def _mean_metrics(metric_list, prefix=""):
    stacked = {}
    for k in metric_list[0]:
        vals = [np.asarray(jax.device_get(m[k])).mean() for m in metric_list]
        stacked[f"{prefix}{k}"] = float(np.mean(vals))
    return stacked


def build_test_step(flags_obj, model, train_dataset, eval_transform, use_text):
    """Rollout-eval step factory (reference create_test_step, main_procgen.py:171-229)."""
    from ..envs.fake import FakeProcgen
    from ..envs.rollout import batch_rollout

    env_conf = {
        "episode_length": flags_obj.episode_length,
        "eval_env_type": flags_obj.env_eval_env_type,
        "distribution_mode": flags_obj.env_distribution_mode,
        "num_levels": flags_obj.env_num_levels,
        "start_level": flags_obj.env_start_level,
    }
    if flags_obj.eval_env == "fake":
        environment = FakeProcgen(flags_obj.game_name, {"episode_length": flags_obj.episode_length})
    else:
        from ..envs.procgen import Procgen

        environment = Procgen(flags_obj.game_name, env_conf)

    instruct_info = {"instruct": None, "text_padding_mask": None}
    if use_text:
        ids, pad = train_dataset.tokenizer(get_m3ae_instruct(flags_obj.game_name) or "")
        instruct_info = {"instruct": ids[None], "text_padding_mask": pad[None]}

    reward_engine = None
    text = None
    if flags_obj.use_vl:
        game = (
            flags_obj.game_name
            if flags_obj.env_eval_env_type == "none"
            else f"{flags_obj.game_name}_{flags_obj.env_eval_env_type}"
        )
        if flags_obj.data.inst_type != "none":
            text = get_clip_special_instruct(game, flags_obj.data.inst_type)
        else:
            text = get_clip_instruct(game)
        try:
            from ..reward.engine import ClipRewardEngine

            reward_engine = ClipRewardEngine(
                batch_size=64,
                resize_mode="pil",
                use_crop=flags_obj.use_crop,
                compute_dtype=jnp.bfloat16 if flags_obj.reward_bf16 else jnp.float32,
            )
        except FileNotFoundError:
            absl_logging.warning("no CLIP checkpoint for eval rewards; rtg stays constant")
            reward_engine = None

    @jax.jit
    def policy_fn_jit(params, inputs):
        merged = dict(inputs)
        merged.update(instruct_info)
        return model.apply({"params": params}, merged, method=model.greedy_action)

    return_to_go = (
        getattr(train_dataset, "return_to_go", 1000.0)
        if flags_obj.return_to_go == 0
        else flags_obj.return_to_go
    )
    scale = getattr(train_dataset, "scale", 100.0)

    def transform_obs(val):
        return eval_transform(np.asarray(val))

    def test_step_fn(gstate, rng):
        params = jax.device_get(gstate.params)

        def policy(inputs, rngs):
            return policy_fn_jit(params, inputs)

        return batch_rollout(
            rng=rng,
            data_aug_rng=rng,
            env=environment,
            policy_fn=policy,
            transform_obs_fn=transform_obs,
            episode_length=flags_obj.episode_length,
            window_size=flags_obj.window_size,
            num_episodes=flags_obj.num_test_episodes,
            return_to_go=return_to_go,
            scale=scale,
            reward_engine=reward_engine,
            vl_type=flags_obj.vl_type,
            text=text,
            reward_min=getattr(train_dataset, "reward_min", 0.0),
            use_normalize=flags_obj.data.use_normalize,
            use_crop=flags_obj.use_crop,
            eval_data_path=flags_obj.eval_data_path or None,
        )

    return test_step_fn


if __name__ == "__main__":
    app.run(main)
