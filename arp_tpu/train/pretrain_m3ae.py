"""M3AE pretraining — ``python -m arp_tpu.train.pretrain_m3ae``.

The reference *consumes* externally pretrained M3AE checkpoints it cannot
reproduce (hard-coded local pickle paths, m3ae/model.py:996-1015).  This
trainer closes that gap: masked multimodal autoencoding (image-patch MSE +
text CE, m3ae/model.py:40-74 losses) on demonstration frames + instructions,
jitted over the dp/fsdp mesh, producing checkpoints the policy models load
directly (same param tree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from absl import app, flags, logging as absl_logging
from flax.training.train_state import TrainState

from ..config import define_flags_with_default, get_user_flags
from ..checkpoint import CheckpointManager
from ..data.loader import DataLoader
from ..data.procgen_dataset import ProcgenDataset, build_instruction_tokenizer
from ..data.instructions import get_m3ae_instruct
from ..logging_utils import MetricsLogger
from ..models.m3ae import (
    MaskedMultimodalAutoencoder,
    cross_entropy_loss_and_accuracy,
    extract_patches,
    patch_mse_loss,
)
from ..parallel import MeshConfig, create_mesh, make_train_step, shard_batch
from ..parallel.step import shard_train_state
from ..rng import next_rng, set_random_seed

FLAGS_DEF = define_flags_with_default(
    seed=42,
    epochs=10,
    batch_size=64,
    lr=1.5e-4,
    weight_decay=0.05,
    warmup_epochs=1.0,
    log_freq=50,
    dataset_name="coinrun_hard_level0to500_num500_frame8",
    patch_size=16,
    image_size=256,
    text_length=64,
    unpaired_text_ratio=0.0,
    checkpoint_dir="",
    mesh_dp=-1,
    mesh_fsdp=1,
    model=MaskedMultimodalAutoencoder.get_default_config(),
    data=ProcgenDataset.get_default_config(),
    logging=MetricsLogger.get_default_config(),
)

FLAGS = flags.FLAGS

BERT_VOCAB_SIZE = 30522


class FramesWithText:
    """Wraps ProcgenDataset rows into (image, text) pretraining samples."""

    def __init__(self, dataset, text_length: int):
        self.dataset = dataset
        tokenizer = build_instruction_tokenizer(True, text_length)
        instruct = get_m3ae_instruct(dataset.env_name) or ""
        self.text, self.pad = tokenizer(instruct)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        frames = self.dataset._read_frames("ob", i)
        return {
            "image": frames[-1],  # last stacked frame
            "text": self.text,
            "text_padding_mask": self.pad,
        }


def main(argv):
    del argv
    variant = get_user_flags(FLAGS, FLAGS_DEF)
    set_random_seed(FLAGS.seed)
    logger = MetricsLogger(config=FLAGS.logging, variant=variant)

    base = ProcgenDataset(FLAGS.data, dataset_name=FLAGS.dataset_name, split="train")
    dataset = FramesWithText(base, FLAGS.text_length)
    loader = DataLoader(dataset, FLAGS.batch_size, shuffle=True, seed=FLAGS.seed)

    model = MaskedMultimodalAutoencoder(
        config_updates=FLAGS.model,
        text_vocab_size=BERT_VOCAB_SIZE,
        image_output_dim=FLAGS.patch_size * FLAGS.patch_size * 3,
    )

    steps_per_epoch = max(1, len(dataset) // FLAGS.batch_size)
    total_steps = steps_per_epoch * FLAGS.epochs
    warmup_steps = min(int(FLAGS.warmup_epochs * steps_per_epoch), max(total_steps - 1, 0))
    schedule = optax.warmup_cosine_decay_schedule(0.0, FLAGS.lr, warmup_steps, total_steps)
    no_decay = set(model.no_decay_list())

    def decay_mask(params):
        import flax

        flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
        return flax.traverse_util.unflatten_dict(
            {p: not any(nd in k for nd in no_decay for k in p) for p in flat}
        )

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=FLAGS.weight_decay, mask=decay_mask),
    )

    sample = next(iter(loader))
    patch_size = FLAGS.patch_size

    def prepare(batch, rng):
        image = batch["image"].astype(jnp.float32) / 255.0
        if image.shape[1] != FLAGS.image_size:
            image = jax.image.resize(
                image, (image.shape[0], FLAGS.image_size, FLAGS.image_size, 3), "bilinear"
            )
        patches = extract_patches(image, patch_size)
        return patches

    def loss_fn(params, batch, rng):
        noise_rng, drop_rng = jax.random.split(rng)
        patches = prepare(batch, rng)
        text = batch["text"].astype(jnp.int32)
        pad = batch["text_padding_mask"].astype(jnp.float32)
        image_out, text_out, image_mask, text_mask = model.apply(
            {"params": params},
            patches,
            text,
            pad,
            deterministic=False,
            rngs={"noise": noise_rng, "drop_path": drop_rng},
        )
        img_loss = patch_mse_loss(image_out, patches, image_mask)
        txt_loss, txt_acc = cross_entropy_loss_and_accuracy(
            text_out, text, (1.0 - pad) * text_mask
        )
        loss = img_loss + txt_loss
        return loss, {"image_loss": img_loss, "text_loss": txt_loss, "text_acc": txt_acc}

    init_rngs = {"params": next_rng(), "noise": next_rng(), "drop_path": next_rng()}
    patches0 = prepare(jax.tree_util.tree_map(jnp.asarray, sample), jax.random.PRNGKey(0))
    params = jax.jit(
        lambda r, p, t, m: model.init(r, p, t, m, deterministic=True)
    )(init_rngs, patches0[:1], jnp.asarray(sample["text"][:1], jnp.int32), jnp.asarray(sample["text_padding_mask"][:1]))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    mesh = create_mesh(MeshConfig(dp=FLAGS.mesh_dp, fsdp=FLAGS.mesh_fsdp))
    ckpt = CheckpointManager(FLAGS.checkpoint_dir) if FLAGS.checkpoint_dir else None

    with mesh:
        step_fn = make_train_step(loss_fn, mesh, learning_rate_fn=schedule)
        gstate = shard_train_state(state, mesh)
        rng = jax.random.PRNGKey(FLAGS.seed)
        step = 0
        for epoch in range(FLAGS.epochs):
            for batch in loader:
                rng, srng = jax.random.split(rng)
                gstate, aux = step_fn(gstate, shard_batch(batch, mesh), srng)
                if step % FLAGS.log_freq == 0:
                    logged = {k: float(np.asarray(jax.device_get(v)).mean()) for k, v in aux.items()}
                    logged.update(step=step, epoch=epoch)
                    logger.log(logged)
                step += 1
            if ckpt is not None:
                ckpt.save(step, jax.device_get(gstate), metadata={"epoch": epoch}, wait=True)
    absl_logging.info("pretraining done: %d steps", step)
    logger.close()


if __name__ == "__main__":
    app.run(main)
