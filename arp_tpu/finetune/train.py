"""CLIP adapter fine-tuning CLI — ``python -m arp_tpu.finetune.train``.

JAX replacement for the reference's torch driver (finetune_module/finetune.py):
frozen CLIP backbone (variables passed as non-trainable constants), AdamW on
the adapter params, jitted train/val steps over the mesh, best-val orbax
checkpointing.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import optax
from absl import app, flags
from flax.training.train_state import TrainState

from ..config import define_flags_with_default, get_user_flags
from ..checkpoint import CheckpointManager
from ..data.loader import DataLoader
from ..logging_utils import MetricsLogger
from ..models.clip import load_model_vars
from ..parallel import MeshConfig, create_mesh, shard_batch
from ..parallel.step import shard_train_state
from ..rng import next_rng, set_random_seed
from .adapter_model import ClipMultiscaleAdapter
from .dataset import ProcgenActionDataset

FLAGS_DEF = define_flags_with_default(
    seed=42,
    epochs=10,
    batch_size=32,
    lr=1e-4,
    weight_decay=1e-4,
    log_freq=50,
    dataset_name="coinrun_hard_level0to500_num500_frame8",
    clip_model="vit_b16",
    clip_checkpoint="",
    use_vip_loss=True,
    use_id_loss=True,
    use_tcn_loss=False,
    goal_conditioned=False,
    checkpoint_dir="",
    image_size=224,
    data=ProcgenActionDataset.get_default_config(),
    logging=MetricsLogger.get_default_config(),
    mesh_dp=-1,
)

FLAGS = flags.FLAGS


def main(argv):
    del argv
    variant = get_user_flags(FLAGS, FLAGS_DEF)
    set_random_seed(FLAGS.seed)
    logger = MetricsLogger(config=FLAGS.logging, variant=variant)

    train_dataset = ProcgenActionDataset(FLAGS.data, dataset_name=FLAGS.dataset_name, split="train")
    val_dataset = ProcgenActionDataset(FLAGS.data, dataset_name=FLAGS.dataset_name, split="val")
    train_loader = DataLoader(train_dataset, FLAGS.batch_size, shuffle=True, seed=FLAGS.seed)
    # drop_last=False: a val split smaller than batch_size must not crash, and
    # val loss / best-checkpoint selection should see the tail batch
    val_loader = DataLoader(
        val_dataset, FLAGS.batch_size, shuffle=False, seed=FLAGS.seed, drop_last=False
    )

    import os as _os

    if _os.environ.get("ARP_TPU_TINY_CLIP") == "1":
        # test/smoke hook: register a tiny CLIP config so the CLI can run
        # end-to-end without full-size weights
        from ..models.clip.model import CONFIGS as _CONFIGS

        _CONFIGS["tiny_test"] = dict(
            embed_dim=16, vocab_size=97, vision_num_layers=2, vision_features=64,
            vision_patch_size=8, text_features=16, text_num_heads=4, text_num_layers=2,
        )

    model = ClipMultiscaleAdapter(
        clip_model_name=FLAGS.clip_model,
        action_dim=train_dataset.num_actions,
        use_vip_loss=FLAGS.use_vip_loss,
        use_id_loss=FLAGS.use_id_loss,
        use_tcn_loss=FLAGS.use_tcn_loss,
        goal_conditioned=FLAGS.goal_conditioned,
    )
    if FLAGS.clip_checkpoint == "random":
        # random-init backbone (smoke runs / training-dynamics checks)
        from ..models.clip.model import CLIP, CONFIGS as _CONFIGS

        _clip = CLIP(**_CONFIGS[FLAGS.clip_model])
        import jax.numpy as jnp

        # the adapter's preprocess always feeds 224x224 into the backbone
        clip_variables = jax.jit(_clip.init)(
            next_rng(), jnp.zeros((1, 224, 224, 3)), jnp.zeros((1, 77), jnp.int32)
        )
    else:
        clip_variables = load_model_vars(
            FLAGS.clip_model, checkpoint_path=FLAGS.clip_checkpoint or None
        )

    sample = next(iter(train_loader))
    params = jax.jit(lambda r, cv, b: model.init(r, cv, b, train=False))(
        {"params": next_rng(), "aug": next_rng()}, clip_variables, sample
    )["params"]
    tx = optax.adamw(FLAGS.lr, weight_decay=FLAGS.weight_decay)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = create_mesh(MeshConfig(dp=FLAGS.mesh_dp))
    ckpt = CheckpointManager(FLAGS.checkpoint_dir) if FLAGS.checkpoint_dir else None

    def loss_fn(params, clip_vars, batch, rng):
        loss, metrics = model.apply(
            {"params": params}, clip_vars, batch, train=True, rngs={"aug": rng}
        )
        return loss, metrics

    @jax.jit
    def train_step(state, clip_vars, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, clip_vars, batch, rng
        )
        return state.apply_gradients(grads=grads), dict(metrics, loss=loss)

    @jax.jit
    def val_step(state, clip_vars, batch):
        loss, metrics = model.apply({"params": state.params}, clip_vars, batch, train=False)
        return dict(metrics, loss=loss)

    with mesh:
        gstate = shard_train_state(state, mesh)
        # one-time host->device transfer of the frozen backbone: numpy jit
        # arguments are re-copied EVERY call, which would re-upload the whole
        # CLIP tree per step
        from ..parallel.mesh import replicated

        clip_vars_dev = jax.device_put(clip_variables, replicated(mesh))

        rng = jax.random.PRNGKey(FLAGS.seed)
        step = 0
        best_val = np.inf
        for epoch in range(FLAGS.epochs):
            for batch in train_loader:
                rng, srng = jax.random.split(rng)
                gstate, metrics = train_step(gstate, clip_vars_dev, shard_batch(batch, mesh), srng)
                if step % FLAGS.log_freq == 0:
                    logged = {f"train_{k}": float(np.asarray(v)) for k, v in metrics.items()}
                    logged.update(step=step, epoch=epoch)
                    logger.log(logged)
                step += 1

            val_losses = []
            for batch in val_loader:
                m = val_step(gstate, clip_vars_dev, shard_batch(batch, mesh))
                val_losses.append(float(np.asarray(m["loss"])))
            val_loss = float(np.mean(val_losses)) if val_losses else np.inf
            logger.log({"val_loss": val_loss, "epoch": epoch, "step": step})
            if ckpt is not None and val_loss < best_val:
                best_val = val_loss
                ckpt.save_best(step, jax.device_get(gstate), -val_loss, metadata={"epoch": epoch})
        if ckpt is not None:
            ckpt.save(step, jax.device_get(gstate), metadata={"epoch": FLAGS.epochs}, wait=True)
    logger.close()


if __name__ == "__main__":
    app.run(main)
