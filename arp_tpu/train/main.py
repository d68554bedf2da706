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
from absl import app, flags, logging as absl_logging
from flax.training.train_state import TrainState

from ..config import define_flags_with_default, get_user_flags
from ..checkpoint import CheckpointManager
from ..data.loader import DataLoader
from ..data.procgen_dataset import ProcgenDataset, dataset_dirname
from ..data.instructions import get_m3ae_instruct
from ..logging_utils import MetricsLogger
from ..models.policy import get_policy_default_config
from .common import (
    _host_batch_to_arrays,
    _mean_metrics,
    build_lr_schedule,
    build_model,
    build_optimizer,
    build_test_step,
    flops_analysis,
    get_dummy_input,
    make_eval_loss_fn,
    make_loss_fn,
)
from ..ops.augment import make_augment_fn, make_eval_transform
from ..parallel import MeshConfig, create_mesh, gather_to_host, make_train_step, shard_batch
from ..parallel.prefetch import ThreadedPrefetch
from ..parallel.step import make_eval_step, shard_train_state
from ..profiling import StepTimer
from ..resilience import FaultDetector, Heartbeat, PreemptionHandler
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
    # >1: batched lockstep eval via parallel_rollout (waves of N envs)
    eval_parallel_envs=0,
    # 0.0 = greedy decode (reference parity); >0 = seeded temperature sampling
    eval_temperature=0.0,
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
    # --- TPU-native additions ---
    mesh_dp=-1,
    mesh_fsdp=1,
    mesh_tp=1,
    mesh_pp=1,
    mesh_dcn_dp=1,
    mesh_pp_microbatches=4,
    accum_steps=1,
    checkpoint_dir="",
    episode_length=500,
    eval_env="fake",  # fake | procgen | none
    env_eval_env_type="none",
    env_distribution_mode="hard",
    env_num_levels=500,
    env_start_level=0,
    # fake-env only: hide the goal block in observations (the stub
    # benchmark's goal-conditioned split — scripts/stub_benchmark.py)
    env_hidden_goal=False,
    reward_bf16=False,
    patch_dim=16,
    encode_image_size=0,
    explicit_l2_penalty=False,
    # what to DO on a detected nan/spike (resilience.py): "log" keeps the r2
    # behavior, "halt" exits non-zero, "rollback" restores the latest orbax
    # checkpoint and keeps consuming data forward (skips the bad region)
    fault_policy="log",
    # heartbeat file for external watchdogs; "" -> <output_dir>/heartbeat,
    # "off" disables
    heartbeat_path="",
    heartbeat_interval=60.0,
    # chaos-testing hook: poison the batch at this step with NaNs to exercise
    # the fault-detection/rollback path end to end (-1 = never)
    fault_inject_step=-1,
    # pre-flight demo-file validation (data/validate.py): abort on schema
    # errors before spending device time; synthetic-data invariants
    # (stacking/rtg) only warn here — the CLI validator is stricter
    validate_data=True,
    # capture an XLA profiler trace (tensorboard trace-viewer format) of
    # steps [profile_start_step, profile_start_step + profile_steps)
    profile_dir="",
    profile_start_step=5,  # skip compile + warmup by default
    profile_steps=3,
)

FLAGS = flags.FLAGS


def _state_finite(state) -> bool:
    """True iff every floating param leaf is finite (one fused abs-sum reduce;
    inf/nan propagate into the total)."""
    leaves = [
        l for l in jax.tree_util.tree_leaves(state.params)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    total = sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves)
    return bool(np.isfinite(np.asarray(total)))


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

    if FLAGS.validate_data:
        # pre-flight BEFORE dataset construction: ProcgenDataset itself reads
        # ob/done and would crash with a raw traceback on the same defects
        from ..data.validate import validate_file

        img_key = (FLAGS.data.image_key or "ob").split(", ")[0]
        for split in ("train", "val"):
            path = f"{FLAGS.data.path}/{dataset_name}/data_{split}.hdf5"
            rep = validate_file(path, image_key=img_key, strict_stacking=False)
            for w in rep.warnings:
                absl_logging.warning("data validation: %s: %s", path, w)
            if rep.errors:
                raise ValueError(
                    f"invalid demo file {path}: " + "; ".join(rep.errors)
                    + " (rerun with --validate_data=False to override)"
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
    n_dev = jax.device_count()
    val_batch_size = max(1, min(process_batch_size, len(val_dataset) // max(process_count, 1)))
    # batches shard over the mesh: keep them a multiple of the device count
    val_batch_size = max(n_dev, (val_batch_size // n_dev) * n_dev)
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

    mesh = create_mesh(
        MeshConfig(dp=FLAGS.mesh_dp, fsdp=FLAGS.mesh_fsdp, tp=FLAGS.mesh_tp, pp=FLAGS.mesh_pp, dcn_dp=FLAGS.mesh_dcn_dp)
    )
    absl_logging.info("mesh: %s", mesh)
    if FLAGS.mesh_pp > 1:
        # pipeline the policy block stack over the pp axis (models/layers.py
        # PipelinedTransformer); the model needs the mesh at construction
        FLAGS.model.pp_stages = FLAGS.mesh_pp
        FLAGS.model.pp_microbatches = FLAGS.mesh_pp_microbatches
    use_goal = "GCBC" in FLAGS.vl_type
    frozen_qpack = None
    if FLAGS.model.get("frozen_int8", False):
        from .common import maybe_build_frozen_qpack

        sample = _host_batch_to_arrays(next(iter(train_loader)), use_text, use_goal)
        # persist the calibration scales next to the checkpoint: a restore
        # (resume or eval) rebuilds this exact pack instead of recalibrating
        frozen_qpack = maybe_build_frozen_qpack(
            FLAGS, sample, use_goal, checkpoint_dir=FLAGS.checkpoint_dir, save=True
        )
    model = build_model(FLAGS, train_dataset.num_actions, mesh=mesh, frozen_qpack=frozen_qpack)
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
    if FLAGS.encode_image_size > 0:
        image_size = FLAGS.encode_image_size
    if transfer.endswith("_cached"):
        augment_fn = None  # embeddings are precomputed from un-augmented frames
    else:
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
            # decoupled adamw already applies weight decay; the reference ALSO
            # adds an explicit 0.5*wd*||W||^2 loss penalty on top
            # (main_procgen.py:114-117) — enable for exact parity.
            weight_decay=FLAGS.weight_decay if FLAGS.explicit_l2_penalty else 0.0,
            learning_rate_fn=learning_rate,
            accum_steps=FLAGS.accum_steps,
        )
        eval_step = make_eval_step(eval_loss_fn)
        gstate = shard_train_state(state, mesh)

        if process_index == 0:
            gb = shard_batch(_host_batch_to_arrays(next(iter(train_loader)), use_text, use_goal), mesh)
            flops = flops_analysis(train_step, gstate, gb, jax.random.PRNGKey(0))
            logger.log({"cost/flops": flops})

        # eval setup (build_test_step returns None for cached-embedding
        # policies, which cannot encode env frames)
        test_step_fn = None
        if FLAGS.eval_env != "none":
            test_step_fn = build_test_step(
                FLAGS, model, train_dataset, eval_transform, use_text, mesh=mesh
            )

        # exact-resume: fast-forward the loader to the batch after start_step
        train_iter = ThreadedPrefetch(
            (
                shard_batch(_host_batch_to_arrays(b, use_text, use_goal), mesh)
                for b in train_loader.epochs(skip_batches=start_step)
            ),
            capacity=2,
        )
        rng = jax.random.PRNGKey(FLAGS.seed)
        preemption = PreemptionHandler()
        faults = FaultDetector()
        step_timer = StepTimer()
        heartbeat = None
        if FLAGS.heartbeat_path != "off" and process_index == 0:
            hb_path = FLAGS.heartbeat_path or os.path.join(
                logger.config.output_dir, "heartbeat"
            )
            heartbeat = Heartbeat(hb_path, interval_s=FLAGS.heartbeat_interval)

        best_eval_score = -np.inf
        train_metrics = []
        last_rollback_step = None  # livelock guard for fault_policy=rollback
        profiling_active = False
        # offsets are relative to THIS run's first step so a checkpoint-resumed
        # job (start_step >> 0) still profiles its warm steps
        profile_start = start_step + FLAGS.profile_start_step
        profile_stop = profile_start + max(FLAGS.profile_steps, 1)
        for step in range(start_step, total_steps):
            if FLAGS.profile_dir and process_index == 0:
                if step == profile_start:
                    absl_logging.info("profiler: tracing %d steps to %s",
                                      profile_stop - profile_start, FLAGS.profile_dir)
                    jax.profiler.start_trace(FLAGS.profile_dir)
                    profiling_active = True
                elif profiling_active and step == profile_stop:
                    jax.block_until_ready(gstate.params)  # close open device work
                    jax.profiler.stop_trace()
                    profiling_active = False
            batch = next(train_iter)
            if FLAGS.fault_inject_step >= 0 and step == FLAGS.fault_inject_step:
                absl_logging.warning("chaos: injecting NaN batch at step %d", step)
                batch = jax.tree_util.tree_map(
                    lambda x: x * jnp.nan if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    batch,
                )
            epoch = step // steps_per_epoch
            rng, step_rng = jax.random.split(rng)
            gstate, aux = train_step(gstate, batch, step_rng)
            train_metrics.append(aux)
            step_timer.tick()
            if heartbeat is not None:
                heartbeat.beat(step)

            if preemption.should_stop:
                absl_logging.warning("preemption signal: checkpointing and exiting at step %d", step)
                if ckpt is not None:
                    ckpt.save(step, gather_to_host(gstate, mesh), metadata={"step": step, "epoch": epoch}, wait=True)
                break

            if step and step % FLAGS.log_freq == 0:
                logged = _mean_metrics(train_metrics, prefix="train_")
                status = faults.check(logged["train_loss"])
                if status != "ok":
                    absl_logging.error("fault detector: %s at step %d (loss=%s)", status, step, logged["train_loss"])
                    logged["fault"] = status
                    if FLAGS.fault_policy == "halt":
                        logged.update(step=step, epoch=epoch)
                        logger.log(logged)
                        train_iter.close()
                        raise SystemExit(
                            f"fault detector: {status} at step {step} (fault_policy=halt)"
                        )
                    if FLAGS.fault_policy == "rollback":
                        if ckpt is None or ckpt.latest_step() is None:
                            train_iter.close()
                            raise SystemExit(
                                f"fault detector: {status} at step {step}; rollback "
                                "requested but no checkpoint exists (--checkpoint_dir)"
                            )
                        ckpt.wait()  # an async save may still be finalizing
                        host_state, meta = ckpt.restore(gather_to_host(gstate, mesh))
                        restored_step = int(meta.get("step", -1))
                        if not _state_finite(host_state):
                            # the poison reached a save before detection — a
                            # restore->fault->restore livelock otherwise
                            train_iter.close()
                            raise SystemExit(
                                f"fault detector: {status} at step {step}; latest "
                                f"checkpoint (step {restored_step}) is itself "
                                "non-finite — halting instead of looping"
                            )
                        if restored_step == last_rollback_step:
                            train_iter.close()
                            raise SystemExit(
                                f"fault detector: {status} recurred immediately "
                                f"after restoring step {restored_step} — data or "
                                "model divergence, not a transient; halting"
                            )
                        last_rollback_step = restored_step
                        gstate = shard_train_state(host_state, mesh)
                        faults.reset()
                        logged["rolled_back_to"] = restored_step
                        absl_logging.warning(
                            "fault rollback: restored step %s, continuing forward at step %d",
                            meta.get("step"), step,
                        )
                logged.update(step=step, epoch=epoch, **step_timer.metrics(FLAGS.batch_size))
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
                if val_metrics:
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
                    if np.isfinite(score) and _state_finite(gstate):
                        ckpt.save_best(step, gather_to_host(gstate, mesh), score, metadata={"step": step})
                    else:
                        absl_logging.error("skipping best-save at step %d: non-finite score/params", step)
                best_eval_score = max(best_eval_score, score)

            if ckpt is not None and step and (
                (save_model_freq > 0 and step % save_model_freq == 0) or step == total_steps - 1
            ):
                # never persist poisoned state: a NaN checkpoint would defeat
                # fault_policy=rollback (restore->fault->restore livelock)
                if _state_finite(gstate):
                    ckpt.save(step, gather_to_host(gstate, mesh), metadata={"step": step, "epoch": epoch})
                else:
                    absl_logging.error("skipping checkpoint at step %d: non-finite params", step)

        if profiling_active:  # loop ended inside the profile window
            jax.block_until_ready(gstate.params)
            jax.profiler.stop_trace()

        if train_metrics:  # flush whatever the log cadence left over
            logged = _mean_metrics(train_metrics, prefix="train_")
            logged.update(step=total_steps - 1, **step_timer.metrics(FLAGS.batch_size))
            logger.log(logged)

        if ckpt is not None:
            ckpt.wait()
        train_iter.close()  # releases the producer thread on early exits too
    logger.log({"final_step": total_steps, "best_eval_score": float(best_eval_score)})
    logger.close()


if __name__ == "__main__":
    app.run(main)
