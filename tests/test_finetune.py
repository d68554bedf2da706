"""CLIP multiscale adapter fine-tuning tests (tiny CLIP, synthetic quadruples)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training.train_state import TrainState

from arp_tpu.finetune.adapter_model import ClipMultiscaleAdapter
from arp_tpu.finetune.dataset import ProcgenActionDataset
from arp_tpu.models.clip import CLIP

TINY_CFG = dict(
    embed_dim=16,
    vocab_size=97,
    # vision DEEPER than text on purpose: the adapter consumes only the
    # first text_num_layers visual intermediates (reference quirk) — equal
    # depths would make that slice a no-op no test could falsify
    vision_num_layers=3,
    vision_features=64,
    vision_patch_size=8,
    text_features=16,
    text_num_heads=4,
    text_num_layers=2,
)
IMG = 32


class TinyAdapter(ClipMultiscaleAdapter):
    """Adapter wired to the tiny CLIP config."""

    def setup(self):
        self.clip_model = CLIP(**TINY_CFG)
        self.num_clip_layers = TINY_CFG["text_num_layers"]
        self.visual_dim = TINY_CFG["vision_features"]
        self.text_dim = TINY_CFG["text_features"]
        L = self.num_clip_layers
        import flax.linen as nn

        self.image_intermediate_linear = nn.Dense(self.text_dim * L, use_bias=False)
        self.text_intermediate_linear = nn.Dense(self.text_dim * L, use_bias=False)
        from arp_tpu.models.layers import AdapterMLP

        self.image_adapter = AdapterMLP(hidden_dim=16 * (L + 1), output_dim=16 * (L + 1), num_layers=2)
        self.text_adapter = AdapterMLP(hidden_dim=16 * (L + 1), output_dim=16 * (L + 1), num_layers=2)
        self.inverse_layer = AdapterMLP(hidden_dim=16, output_dim=self.action_dim, num_layers=2)
        self.image_residual_weight = self.param("image_residual_weight", nn.initializers.constant(4.0), ())
        self.text_residual_weight = self.param("text_residual_weight", nn.initializers.constant(4.0), ())
        self.lambda_id = self.param("lambda_id", nn.initializers.constant(float(np.log(1 / 0.07))), ())


def tiny_tokens(batch=2):
    t = np.zeros((batch, 77), np.int32)
    t[:, 0] = 90
    t[:, 1] = 5
    t[:, 2] = 96
    return t


@pytest.fixture(scope="module")
def adapter_setup():
    clip_model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 224, 224, 3)).astype(np.float32))
    clip_vars = clip_model.init(jax.random.PRNGKey(0), img, jnp.asarray(tiny_tokens(1)))
    model = TinyAdapter(action_dim=15)
    batch = make_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        clip_vars, batch, train=False,
    )["params"]
    return model, clip_vars, params


def make_batch(rng, b=2):
    batch = {}
    for i in range(4):
        batch[f"image{i}"] = {"ob": jnp.asarray(rng.integers(0, 256, size=(b, IMG, IMG, 3), dtype=np.uint8))}
    batch["r"] = jnp.asarray(rng.integers(0, 2, size=(b, 1)).astype(np.int32))
    batch["instruct"] = jnp.asarray(tiny_tokens(b))
    batch["action"] = jnp.asarray(rng.integers(0, 15, size=(b,)).astype(np.int32))
    return batch


def test_adapter_losses_finite(adapter_setup):
    model, clip_vars, params = adapter_setup
    rng = np.random.default_rng(1)
    batch = make_batch(rng)
    loss, metrics = model.apply(
        {"params": params}, clip_vars, batch, train=True, rngs={"aug": jax.random.PRNGKey(3)}
    )
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["ob_vip_loss"]))
    assert np.isfinite(float(metrics["ob_id_loss"]))


def test_adapter_trains_and_clip_frozen(adapter_setup):
    """Gradient steps reduce the loss; CLIP variables are untouched by design."""
    model, clip_vars, params = adapter_setup
    rng = np.random.default_rng(2)
    batch = make_batch(rng, b=4)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=optax.adam(1e-3))

    @jax.jit
    def step(state, batch, rng):
        def loss_fn(p):
            loss, m = model.apply({"params": p}, clip_vars, batch, train=False)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    losses = []
    for i in range(6):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # only adapter params are in the trainable tree
    flat = jax.tree_util.tree_leaves_with_path(state.params)
    names = {"/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat}
    assert not any("clip_model" in n for n in names)


def test_encode_features_normalized(adapter_setup):
    model, clip_vars, params = adapter_setup
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.normal(size=(2, 224, 224, 3)).astype(np.float32))
    feat = model.apply({"params": params}, clip_vars, img, method=model.encode_image)
    L = TINY_CFG["text_num_layers"]
    assert feat.shape == (2, 16 * (L + 1))
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(feat, axis=-1)), 1.0, atol=1e-5)
    tfeat = model.apply({"params": params}, clip_vars, jnp.asarray(tiny_tokens(2)), method=model.encode_text)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(tfeat, axis=-1)), 1.0, atol=1e-5)


def test_quadruple_dataset(tmp_path):
    root = tmp_path / "demos" / "coinrun_hard"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n, f = 20, 4
    with h5py.File(root / "data_train.hdf5", "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, f, 16, 16, 3), dtype=np.uint8))
        g.create_dataset("act", data=rng.integers(0, 15, size=(n, f)).astype(np.int64))
        done = np.zeros((n, f), bool)
        done[9, -1] = done[n - 1, -1] = True
        g.create_dataset("done", data=done)

    class Tok:
        def __call__(self, text):
            return np.zeros((1, 77), np.int32)

    cfg = {"path": str(tmp_path / "demos"), "image_key": "ob"}
    ds = ProcgenActionDataset(cfg, dataset_name="coinrun_hard", split="train", tokenizer=Tok())
    item = ds[3]
    assert set(item) >= {"image0", "image1", "image2", "image3", "r", "instruct", "action"}
    assert item["image0"]["ob"].shape == (16, 16, 3)
    assert item["r"][0] in (0, 1)
    # index 9 is the last of traj 0 -> t+1 clamps to end -> r=1
    assert ds[9]["r"][0] == 1
    assert ds[3]["r"][0] == 0
    # reference-parity action indexing
    cfg2 = dict(cfg, action_at="traj_start")
    ds2 = ProcgenActionDataset(cfg2, dataset_name="coinrun_hard", split="train", tokenizer=Tok())
    with h5py.File(root / "data_train.hdf5", "r") as g:
        assert ds2[3]["action"] == g["act"][0][-1]


def test_tcn_triplet_loss(adapter_setup):
    """TCN helper matches a numpy oracle; use_tcn_loss adds the term."""
    model, clip_vars, params = adapter_setup
    rng = np.random.default_rng(7)
    a, p, n = (jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32)) for _ in range(3))
    got = model.apply({"params": params}, a, p, n, method=model.tcn_loss)
    d_pos = np.sum((np.asarray(a) - np.asarray(p)) ** 2, -1)
    d_neg = np.sum((np.asarray(a) - np.asarray(n)) ** 2, -1)
    want = np.mean(np.maximum(1.0 + d_pos - d_neg, 0.0))
    np.testing.assert_allclose(float(got), want, rtol=1e-6)

    # wiring: enabling the flag adds a finite tcn term to the total loss
    tcn_model = TinyAdapter(action_dim=15, use_tcn_loss=True)
    batch = make_batch(rng)
    loss, metrics = tcn_model.apply({"params": params}, clip_vars, batch, train=False)
    base_loss, _ = model.apply({"params": params}, clip_vars, batch, train=False)
    assert np.isfinite(float(metrics["ob_tcn_loss"]))
    np.testing.assert_allclose(
        float(loss), float(base_loss) + float(metrics["ob_tcn_loss"]), rtol=1e-5
    )


def test_sample_next_index(tmp_path):
    """Distance-constrained sampler honors the min-distance threshold and falls
    back to clamped index±threshold when the trajectory is too short."""
    root = tmp_path / "demos" / "maze_tiny"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n, f = 60, 2
    with h5py.File(root / "data_train.hdf5", "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, f, 8, 8, 3), dtype=np.uint8))
        g.create_dataset("act", data=rng.integers(0, 15, size=(n, f)).astype(np.int64))
        done = np.zeros((n, f), bool)
        done[n - 1, -1] = True
        g.create_dataset("done", data=done)

    class Tok:
        def __call__(self, text):
            return np.zeros((1, 77), np.int32)

    cfg = {"path": str(tmp_path / "demos"), "image_key": "ob", "threshold": 10}
    ds = ProcgenActionDataset(cfg, dataset_name="maze_tiny", split="train", tokenizer=Tok())
    traj = list(range(60))
    for seed in range(5):
        pair = ds.sample_next_index(30, traj, rng=np.random.default_rng(seed))
        assert len(pair) == 2
        assert all(abs(i - 30) >= 10 for i in pair)
    # impossible constraint -> clamped fallback (threshold = min(3*0.8, 10) = 2)
    short = [29, 30, 31]
    pair = ds.sample_next_index(30, short, rng=np.random.default_rng(0))
    assert pair == [29, 31]


def test_latent_image_decoder():
    import optax
    from flax.training.train_state import TrainState

    from arp_tpu.finetune.decoder import LatentImageDecoder, reconstruction_loss

    decoder = LatentImageDecoder(out_hw=28, base_channels=32, start_hw=7)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(4, 48)).astype(np.float32))
    images = jnp.asarray(rng.uniform(size=(4, 28, 28, 3)).astype(np.float32))
    params = decoder.init(jax.random.PRNGKey(0), feats)["params"]
    recon = decoder.apply({"params": params}, feats)
    assert recon.shape == (4, 28, 28, 3)
    assert float(recon.min()) >= 0 and float(recon.max()) <= 1

    state = TrainState.create(apply_fn=decoder.apply, params=params, tx=optax.adam(1e-3))

    @jax.jit
    def step(state):
        loss, grads = jax.value_and_grad(reconstruction_loss)(state.params, decoder, feats, images)
        return state.apply_gradients(grads=grads), loss

    losses = []
    for _ in range(5):
        state, loss = step(state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_finetune_cli_e2e(tmp_path):
    """ARP-DT+ fine-tuning CLI end-to-end with a tiny random-init CLIP."""
    import os
    import subprocess
    import sys

    from tests.cli_env import make_cli_env

    # quadruple source data
    root = tmp_path / "demos" / "coinrun_tiny"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n, f = 24, 4
    for split in ("train", "val"):
        with h5py.File(root / f"data_{split}.hdf5", "w") as g:
            g.create_dataset("ob", data=rng.integers(0, 256, size=(n, f, 32, 32, 3), dtype=np.uint8))
            g.create_dataset("act", data=rng.integers(0, 15, size=(n, f)).astype(np.int64))
            done = np.zeros((n, f), bool)
            done[n // 2 - 1, -1] = done[n - 1, -1] = True
            g.create_dataset("done", data=done)

    env = make_cli_env()
    env["ARP_TPU_TINY_CLIP"] = "1"
    out = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    cmd = [
        sys.executable, "-m", "arp_tpu.finetune.train",
        "--epochs=1", "--batch_size=8", "--lr=1e-4", "--log_freq=1",
        "--use_tcn_loss=True",
        "--dataset_name=coinrun_tiny", "--clip_model=tiny_test",
        "--clip_checkpoint=random", "--image_size=32",
        f"--checkpoint_dir={ckpt}",
        f"--data.path={tmp_path / 'demos'}", "--data.image_key=ob",
        f"--logging.output_dir={out}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    import json

    records = [json.loads(l) for l in open(os.path.join(out, os.listdir(out)[0], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)
    assert any("val_loss" in r for r in records)
    assert os.listdir(ckpt)


def test_clip_ft_reward_engine(adapter_setup):
    """ClipFtRewardEngine end-to-end: batched adapter-encoded text and goal
    rewards through the inherited streaming path (regression: the subclass
    bypasses super().__init__ and must still satisfy host_stage's attribute
    contract)."""
    from arp_tpu.finetune.reward import ClipFtRewardEngine

    model, clip_vars, params = adapter_setup
    engine = ClipFtRewardEngine(
        adapter_params=params,
        clip_variables=clip_vars,
        adapter=model,
        batch_size=4,
        image_size=224,
        tokenizer=lambda text: tiny_tokens(1),
    )
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
    rewards = engine.text_rewards(frames, "get the coin")
    assert rewards.shape == (6,)
    assert np.isfinite(rewards).all()
    goal = engine.goal_rewards(frames, goal_index=-1)
    assert goal.shape == (6,) and np.isfinite(goal).all() and goal[-1] == 0.0


def test_clip_ft_engine_fast_paths(adapter_setup):
    """The packed fast trunk (bf16 / static-int8) matches the flax
    capture_intermediates trunk through the SAME adapter head."""
    from arp_tpu.finetune.reward import ClipFtRewardEngine

    model, clip_vars, params = adapter_setup
    kw = dict(adapter_params=params, clip_variables=clip_vars, adapter=model,
              batch_size=4, image_size=224, tokenizer=lambda text: tiny_tokens(1),
              clip_config=TINY_CFG)
    base = ClipFtRewardEngine(**kw)
    fast = ClipFtRewardEngine(**kw, fast_encode=True)
    q = ClipFtRewardEngine(**kw, fast_int8=True)
    assert base._fast is None  # oracle must run the flax trunk
    assert fast._fast is not None and q._fast is not None

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
    r0 = base.text_rewards(frames, "get the coin")
    r1 = fast.text_rewards(frames, "get the coin")
    r2 = q.text_rewards(frames, "get the coin")
    assert q._fast_q is not None  # lazy calibration ran
    np.testing.assert_allclose(r1, r0, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(r2, r0, rtol=0.15, atol=0.15)


def test_clip_ft_engine_mesh_matches_single_device(adapter_setup):
    """The adapter engine under GSPMD data parallelism (mesh=8 devices)
    reproduces the single-device rewards exactly — the subclass inherits the
    sharded streaming path from ClipRewardEngine."""
    from arp_tpu.finetune.reward import ClipFtRewardEngine
    from arp_tpu.parallel import MeshConfig, create_mesh

    model, clip_vars, params = adapter_setup
    kw = dict(adapter_params=params, clip_variables=clip_vars, adapter=model,
              batch_size=8, image_size=224, tokenizer=lambda text: tiny_tokens(1))
    base = ClipFtRewardEngine(**kw)
    sharded = ClipFtRewardEngine(**kw, mesh=create_mesh(MeshConfig(dp=-1)))
    rng = np.random.default_rng(23)
    frames = rng.integers(0, 256, size=(11, 32, 32, 3), dtype=np.uint8)
    # partitioning changes XLA's fusion order under the float ("fast") resize
    # path -> ~1-ulp drift; bound it tightly instead of expecting equality
    np.testing.assert_allclose(
        sharded.text_rewards(frames, "get the coin"),
        base.text_rewards(frames, "get the coin"),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        sharded.goal_rewards(frames), base.goal_rewards(frames), rtol=1e-5, atol=1e-6
    )
