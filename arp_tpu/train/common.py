"""Shared trainer/eval building blocks (flag-free; see main.py / eval.py)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import logging as absl_logging

from ..data.instructions import (
    get_clip_special_instruct,
    get_eval_instruct,
    get_m3ae_instruct,
)
from ..models.policy import ARPDT, BC, GCBC


def build_model(flags_obj, num_actions: int, mesh=None, frozen_qpack=None):
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
        mesh=mesh,
        frozen_qpack=frozen_qpack,
    )


def _frozen_amax_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "frozen_int8_amax.npz")


def save_frozen_amax(checkpoint_dir: str, amax) -> str:
    """Persist frozen_int8 calibration scales next to the checkpoint.

    The scales are a handful of scalars per layer (KBs); saving them means a
    restored checkpoint rebuilds the EXACT int8 pack it trained with instead
    of recalibrating on whatever batch the restoring process sampled
    (ADVICE r4: eval recalibrated on batch<=8/shuffle=False and saw slightly
    different frozen-tower numerics than training)."""
    import numpy as np

    path = _frozen_amax_path(checkpoint_dir)
    os.makedirs(checkpoint_dir, exist_ok=True)
    np.savez(path, img=np.asarray(amax["img"]),
             **{f"layers/{k}": np.asarray(v) for k, v in amax["layers"].items()})
    return path


def load_frozen_amax(checkpoint_dir: str):
    """Saved calibration scales, or None when absent (pre-round-5 runs)."""
    import numpy as np

    path = _frozen_amax_path(checkpoint_dir)
    if not checkpoint_dir or not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {
            "img": z["img"],
            "layers": {k.split("/", 1)[1]: z[k] for k in z.files if k.startswith("layers/")},
        }


def maybe_build_frozen_qpack(flags_obj, sample_batch, use_goal: bool,
                             checkpoint_dir: str = "", save: bool = False):
    """Calibrated int8 pack for --model.frozen_int8 (None otherwise).

    ``sample_batch`` must be a REAL host batch (the int8 activation scales
    calibrate on it; see models/policy/models.py::build_frozen_qpack).
    With ``checkpoint_dir``: reuse its saved calibration scales when present
    (training-time numerics win over a fresh sample); with ``save``: persist
    freshly-calibrated scales there for future restores.
    """
    if not flags_obj.model.get("frozen_int8", False) or flags_obj.model.use_from_scratch:
        return None
    from ..models.policy import build_frozen_qpack

    image_size = 256
    if getattr(flags_obj, "encode_image_size", 0) > 0:
        image_size = flags_obj.encode_image_size

    amax = load_frozen_amax(checkpoint_dir)
    if amax is not None:
        absl_logging.info(
            "frozen_int8: rebuilding the pack from saved calibration scales (%s)",
            _frozen_amax_path(checkpoint_dir),
        )
        return build_frozen_qpack(
            flags_obj.model, sample_batch, flags_obj.patch_dim,
            image_size=image_size, use_goal=use_goal, amax=amax,
        )
    absl_logging.info("frozen_int8: calibrating the packed encoder on a real batch")
    qpack, amax = build_frozen_qpack(
        flags_obj.model, sample_batch, flags_obj.patch_dim,
        image_size=image_size, use_goal=use_goal, return_amax=True,
    )
    if save and checkpoint_dir:
        save_frozen_amax(checkpoint_dir, amax)
    return qpack


def build_lr_schedule(flags_obj, steps_per_epoch: int, total_steps: int, lr_scale: float = 1.0):
    if flags_obj.lr_schedule == "fixed":
        return optax.linear_schedule(flags_obj.lr, flags_obj.lr, total_steps)
    if flags_obj.lr_schedule == "cos":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=flags_obj.lr * lr_scale,
            # never let warmup consume all of total_steps (optax requires
            # positive post-warmup decay steps)
            warmup_steps=min(int(flags_obj.warmup_epochs * steps_per_epoch), max(total_steps - 1, 0)),
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
    if transfer.endswith("_cached"):
        emb_dim = dataset[0]["image_emb"][dataset.config.image_key.split(", ")[0]].shape[-1]
        dummy = {
            "action": jnp.ones((1, window), jnp.int32),
            "image_emb": {
                k: jnp.ones((1, window, emb_dim), jnp.float32)
                for k in dataset.obs_shape["image"]
            },
            # cached GCBC conditions on goal embeddings (ignored otherwise)
            "goal_emb": {
                k: jnp.ones((1, window, emb_dim), jnp.float32)
                for k in dataset.obs_shape["image"]
            },
            "rtg": {k: jnp.ones((1, window, 1), jnp.float32) for k in dataset.obs_shape["rtg"]},
            "goal": None,
            "instruct": None,
            "text_padding_mask": None,
        }
        return dummy
    image_size = 224 if transfer.startswith("clip") else 256
    if transfer == "none":
        image_size = flags_obj.data.image_size
    if getattr(flags_obj, "encode_image_size", 0) > 0:
        image_size = flags_obj.encode_image_size
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
        if augment_fn is not None and batch.get("image") is not None:
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
        if eval_transform is not None and batch.get("image") is not None:
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




def _host_batch_to_arrays(batch, use_text: bool, use_goal: bool = False):
    """Strip unused entries so no dead bytes cross the host->HBM link."""
    out = dict(batch)
    if not use_text:
        out["instruct"] = None
        out["text_padding_mask"] = None
    if not use_goal:
        out["goal"] = None
        out.pop("goal_emb", None)
    if "image_emb" in out:
        # cached-embedding training: raw frames never leave the host
        out["image"] = None
        if use_goal:
            # cached GCBC conditions on goal EMBEDDINGS; raw goal frames stay
            out["goal"] = None
    return out


def _mean_metrics(metric_list, prefix=""):
    stacked = {}
    for k in metric_list[0]:
        vals = [np.asarray(jax.device_get(m[k])).mean() for m in metric_list]
        stacked[f"{prefix}{k}"] = float(np.mean(vals))
    return stacked


def resolve_goal_eval_data(flags_obj):
    """(eval_data_path | None, filename) for goal-conditioned eval.

    An explicit --eval_data_path wins; with --eval_with_goal the reference
    derives the eval-level dataset dir (start_level+num_levels ..
    num_levels*2, num_test_episodes*10 demos) and reads its eval file
    (main_procgen.py:342-350, :614-632).  This repo's collect stage writes
    data_{split}.hdf5, so the filename default is data_train.hdf5,
    overridable via --eval_data_name.
    """
    eval_data_path = flags_obj.eval_data_path or None
    eval_data_name = getattr(flags_obj, "eval_data_name", "") or "data_train.hdf5"
    if (
        eval_data_path is not None
        and not getattr(flags_obj, "eval_data_name", "")
        and not os.path.exists(os.path.join(eval_data_path, eval_data_name))
        and os.path.exists(os.path.join(eval_data_path, "data.hdf5"))
    ):
        # pre-existing eval dirs may carry a plain data.hdf5
        eval_data_name = "data.hdf5"
    if eval_data_path is None and getattr(flags_obj, "eval_with_goal", False):
        from ..data.procgen_dataset import dataset_dirname

        name = dataset_dirname(
            flags_obj.game_name,
            distribution_mode=flags_obj.env_distribution_mode,
            start_level=flags_obj.env_start_level + flags_obj.env_num_levels,
            num_levels=flags_obj.env_num_levels * 2,
            num_demonstrations=flags_obj.num_test_episodes * 10,
            num_frames=flags_obj.data.num_frames,
            enable_filter=True,
            env_type=flags_obj.env_eval_env_type,
        )
        eval_data_path = os.path.join(flags_obj.data.path, name)
    return eval_data_path, eval_data_name


def build_test_step(flags_obj, model, train_dataset, eval_transform, use_text, mesh=None):
    """Rollout-eval step factory (reference create_test_step, main_procgen.py:171-229).

    Returns None (with a loud warning) for cached-embedding policies: rollout
    eval needs live image encoding, and a ``*_cached`` model has no encoder
    to run on env frames — every caller must handle the None.
    """
    if flags_obj.model.transfer_type.endswith("_cached"):
        absl_logging.warning(
            "rollout eval disabled: transfer_type=%s consumes precomputed "
            "embeddings and cannot encode env frames — evaluate the converted "
            "live-encoder model instead",
            flags_obj.model.transfer_type,
        )
        return None
    from ..envs.fake import FakeProcgen
    from ..envs.rollout import batch_rollout

    env_conf = {
        "episode_length": flags_obj.episode_length,
        "eval_env_type": flags_obj.env_eval_env_type,
        "distribution_mode": flags_obj.env_distribution_mode,
        "num_levels": flags_obj.env_num_levels,
        "start_level": flags_obj.env_start_level,
    }
    fake_conf = {
        "episode_length": flags_obj.episode_length,
        "hidden_goal": bool(getattr(flags_obj, "env_hidden_goal", False)),
    }
    def _make_sequential_env():
        if flags_obj.eval_env == "fake":
            return FakeProcgen(flags_obj.game_name, dict(fake_conf))
        from ..envs.procgen import Procgen

        return Procgen(flags_obj.game_name, env_conf)

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
        if getattr(flags_obj, "eval_instruct", ""):
            # explicit user override (e.g. task-specific text for eval splits
            # the instruction assets do not cover)
            text = flags_obj.eval_instruct
        elif flags_obj.data.inst_type != "none":
            text = get_clip_special_instruct(game, flags_obj.data.inst_type)
        else:
            text = get_eval_instruct(game)
        try:
            # use_crop=False here: compute_step_reward (envs/rollout.py) does
            # the single host-side center crop, exactly like the reference's
            # vl_reward fns — an engine-side crop on top would crop twice.
            vl_ckpt = getattr(flags_obj, "vl_checkpoint", "") or ""
            if flags_obj.vl_type.startswith("clip_ft") and vl_ckpt:
                from ..finetune.reward import ClipFtRewardEngine, load_adapter_params

                reward_engine = ClipFtRewardEngine(
                    load_adapter_params(vl_ckpt), batch_size=64, use_crop=False
                )
            elif vl_ckpt.endswith(".npz"):
                # self-contained engine spec (ClipRewardEngine.save_npz):
                # custom/trained reward towers — e.g. the stub benchmark's
                # progress-trained tiny CLIP — so online rtg rewards at eval
                # come from the same model that labeled the training data
                from ..reward.engine import ClipRewardEngine

                reward_engine = ClipRewardEngine.from_npz(
                    vl_ckpt, batch_size=64, resize_mode="pil", use_crop=False,
                    compute_dtype=jnp.bfloat16 if flags_obj.reward_bf16 else jnp.float32,
                )
            else:
                from ..reward.engine import ClipRewardEngine

                if flags_obj.vl_type.startswith("clip_ft"):
                    absl_logging.warning(
                        "vl_type=%s but no --vl_checkpoint given: eval rewards "
                        "fall back to base CLIP and will NOT match clip_ft "
                        "training labels", flags_obj.vl_type,
                    )
                reward_engine = ClipRewardEngine(
                    batch_size=64,
                    resize_mode="pil",
                    use_crop=False,
                    compute_dtype=jnp.bfloat16 if flags_obj.reward_bf16 else jnp.float32,
                )
        except FileNotFoundError:
            absl_logging.warning("no CLIP checkpoint for eval rewards; rtg stays constant")
            reward_engine = None
        if reward_engine is not None and text is None and flags_obj.vl_type in ("clip", "clip_ft"):
            # fail here with guidance instead of deep inside the rollout's
            # tokenizer (the reference crashes there, main_procgen.py:560-566)
            raise ValueError(
                f"no eval instruction for {game!r} "
                f"(inst_type={flags_obj.data.inst_type!r}); pass --eval_instruct"
            )

    # 0.0 = greedy (reference parity, ARPDT.py:488-492); > 0 = seeded
    # temperature sampling (see BasePolicy.sample_action for why ordering
    # experiments need it)
    temperature = float(getattr(flags_obj, "eval_temperature", 0.0) or 0.0)

    @jax.jit
    def policy_fn_jit(params, inputs, rng):
        merged = dict(inputs)
        # fill instruct only when the caller left it unset — the parallel
        # eval path tiles it to its env batch first
        for k, v in instruct_info.items():
            if merged.get(k) is None:
                merged[k] = v
        if temperature > 0.0:
            return model.apply(
                {"params": params}, merged, rng, temperature, method=model.sample_action
            )
        return model.apply({"params": params}, merged, method=model.greedy_action)

    def make_stepwise_policy_rng(rng):
        """Per-call key stream: the rollout engines pass the SAME key to
        every policy call, which would make temperature sampling repeat one
        sample pattern — fold in a host-side call counter instead."""
        counter = {"t": 0}

        def next_key(base):
            key = jax.random.fold_in(base, counter["t"])
            counter["t"] += 1
            return key

        return lambda base: next_key(base if base is not None else rng)

    return_to_go = (
        getattr(train_dataset, "return_to_go", 1000.0)
        if flags_obj.return_to_go == 0
        else flags_obj.return_to_go
    )
    scale = getattr(train_dataset, "scale", 100.0)

    def transform_obs(val):
        return eval_transform(np.asarray(val))

    eval_data_path, eval_data_name = resolve_goal_eval_data(flags_obj)

    from ..parallel import gather_to_host

    n_parallel = int(getattr(flags_obj, "eval_parallel_envs", 0) or 0)
    if n_parallel > 1:
        # TPU-native batched eval (SURVEY §3.3): N env copies step in
        # lockstep so the policy and reward model run real batches —
        # supersedes the reference's batch=1 ping-pong
        # (arp_dt/envs/rollout_procgen.py:24-182).  Episodes run in waves of
        # n_parallel; metrics are episode-weighted means over waves.
        from ..envs.rollout import parallel_rollout

        def _make_envs(k):
            # record_video off: parallel_rollout returns no videos, so the
            # per-env frame buffers would only burn host RAM
            if flags_obj.eval_env == "fake":
                return [
                    FakeProcgen(flags_obj.game_name, dict(fake_conf, record_video=False))
                    for _ in range(k)
                ]
            from ..envs.procgen import Procgen

            return [
                Procgen(flags_obj.game_name, dict(env_conf, record_video=False))
                for _ in range(k)
            ]

        def parallel_test_step_fn(gstate, rng):
            if mesh is not None:
                params = gather_to_host(gstate.params, mesh)
            else:
                params = jax.device_get(gstate.params)
            step_key = make_stepwise_policy_rng(rng)

            def policy(inputs, rngs):
                if instruct_info["instruct"] is not None:
                    b = inputs["action"].shape[0]
                    inputs = dict(
                        inputs,
                        instruct=np.repeat(np.asarray(instruct_info["instruct"]), b, axis=0),
                        text_padding_mask=np.repeat(
                            np.asarray(instruct_info["text_padding_mask"]), b, axis=0
                        ),
                    )
                return policy_fn_jit(params, inputs, step_key(rngs))

            from ..envs.rollout import load_goal_and_state, open_goal_eval

            total = flags_obj.num_test_episodes
            eval_hdf5 = traj_idx = None
            if eval_data_path is not None:
                eval_hdf5, traj_idx = open_goal_eval(eval_data_path, eval_data_name, total)

            metrics, weights = [], []
            try:
                for wave_start in range(0, total, n_parallel):
                    eps = list(range(wave_start, min(wave_start + n_parallel, total)))
                    goals = states = None
                    if eval_hdf5 is not None:
                        pairs = [
                            load_goal_and_state(eval_data_path, eval_hdf5, traj_idx, ep)
                            for ep in eps
                        ]
                        states = [s for _, s in pairs]
                        # goal-swap sensitivity probe: shift pairs episode
                        # ep's initial state with episode (ep+shift)'s goal
                        # frame — a goal-reading policy must drop, a
                        # goal-blind one is unaffected
                        shift = int(getattr(flags_obj, "eval_goal_shift", 0) or 0)
                        if shift:
                            goals = np.stack([
                                load_goal_and_state(
                                    eval_data_path, eval_hdf5, traj_idx,
                                    (ep + shift) % total,
                                )[0]
                                for ep in eps
                            ])
                        else:
                            goals = np.stack([g for g, _ in pairs])
                    m = parallel_rollout(
                        rng=rng,
                        envs=_make_envs(len(eps)),
                        policy_fn=policy,
                        transform_obs_fn=transform_obs,
                        episode_length=flags_obj.episode_length,
                        window_size=flags_obj.window_size,
                        return_to_go=return_to_go,
                        scale=scale,
                        reward_engine=reward_engine,
                        vl_type=flags_obj.vl_type,
                        text=text,
                        reward_min=getattr(train_dataset, "reward_min", 0.0),
                        use_normalize=flags_obj.data.use_normalize,
                        use_crop=flags_obj.use_crop,
                        goal_images=goals,
                        initial_states=states,
                        feed_goal_to_policy=eval_hdf5 is not None,
                        seed_offset=wave_start,
                    )
                    metrics.append(m)
                    weights.append(len(eps))
            finally:
                if eval_hdf5 is not None:
                    eval_hdf5.close()
            if not metrics:  # num_test_episodes == 0: degrade like a skipped eval
                nan = np.float32("nan")
                return (
                    {"return": nan, "episode_length": nan, "success_rate": nan},
                    {"episode_len": 0.0},
                    [],
                )
            wsum = sum(weights)
            metric = {
                k: np.float32(sum(float(m[k]) * w for m, w in zip(metrics, weights)) / wsum)
                for k in metrics[0]
            }
            return metric, {"episode_len": float(metric["episode_length"])}, []

        return parallel_test_step_fn

    environment = _make_sequential_env()

    def test_step_fn(gstate, rng):
        if mesh is not None:
            params = gather_to_host(gstate.params, mesh)
        else:
            params = jax.device_get(gstate.params)
        step_key = make_stepwise_policy_rng(rng)

        def policy(inputs, rngs):
            return policy_fn_jit(params, inputs, step_key(rngs))

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
            eval_data_path=eval_data_path,
            data_name=eval_data_name,
        )

    return test_step_fn


