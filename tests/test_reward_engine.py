"""Golden tests for the batched reward engine + HDF5 labeler.

An independent per-image reference path (PIL resize -> flax CLIP encode ->
logit, mirroring arp_dt/label_reward.py:123-291 semantics) is computed in the
test and the streamed/batched engine must reproduce it, including the HDF5
dataset keys/layout and the per-trajectory rtg re-stacking.
"""

import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from arp_tpu.ops.rewards import discount_cumsum, stack_frames
from arp_tpu.reward.engine import ClipRewardEngine
from arp_tpu.reward.labeler import label_rewards

# shared fixtures (arp_tpu/testing.py); re-exported here because many test
# modules import them from this file
from arp_tpu.testing import (  # noqa: E402
    TINY_CLIP_CFG as TINY_CFG,
    TINY_CLIP_IMG_SIZE as IMG_SIZE,
    TinyTokenizer,
    make_tiny_clip_engine,
)


@pytest.fixture(scope="module")
def tiny_engine():
    return make_tiny_clip_engine(batch_size=8)


def _reference_rewards(engine, frames, text):
    """Per-image loop replicating the reference torch path semantics."""
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    feats = []
    for f in frames:
        img = np.asarray(Image.fromarray(f).resize((IMG_SIZE, IMG_SIZE), Image.BICUBIC), np.float32)
        x = (img / 255.0 - mean) / std
        feat = engine.model.apply(
            engine.variables, jnp.asarray(x[None]), normalize=True, method=engine.model.encode_image
        )
        feats.append(np.asarray(feat)[0])
    feats = np.stack(feats)
    tfeat = np.asarray(
        engine.model.apply(
            engine.variables, jnp.asarray(TinyTokenizer()(text)), normalize=True,
            method=engine.model.encode_text,
        )
    )
    logit_scale = float(np.exp(np.asarray(engine.variables["params"]["logit_scale"])))
    logits = logit_scale * tfeat @ feats.T
    return logits.mean(axis=0) if logits.shape[0] > 1 else logits[0]


def test_text_rewards_match_per_image_reference(tiny_engine):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(13, 48, 48, 3), dtype=np.uint8)  # odd N -> padding path
    got = tiny_engine.text_rewards(frames, "collect the coin.")
    expected = _reference_rewards(tiny_engine, frames, "collect the coin.")
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_multi_text_rewards_mean(tiny_engine):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(5, 48, 48, 3), dtype=np.uint8)
    texts = ["collect the coin.", "reach the saw."]
    got = tiny_engine.text_rewards(frames, texts)
    expected = _reference_rewards(tiny_engine, frames, texts)
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_goal_rewards_semantics(tiny_engine):
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(6, IMG_SIZE, IMG_SIZE, 3), dtype=np.uint8)
    got = tiny_engine.goal_rewards(frames)
    # unnormalized features, -L2 distance to last frame's features
    feats = tiny_engine._batched_image_features(frames, normalize=False)
    expected = -np.linalg.norm(feats - feats[-1][None], axis=-1)
    np.testing.assert_allclose(got, expected, atol=1e-5)
    assert got[-1] == 0.0


def _make_demo_hdf5(path, n=30, num_frames=4, img=48):
    rng = np.random.default_rng(4)
    with h5py.File(path, "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, num_frames, img, img, 3), dtype=np.uint8))
        g.create_dataset("act", data=rng.integers(0, 15, size=(n, num_frames)).astype(np.int64))
        done = np.zeros((n, num_frames), bool)
        done[9, -1] = done[19, -1] = done[n - 1, -1] = True  # 3 trajectories
        g.create_dataset("done", data=done)
    return [0, 10, 20, n]


def test_labeler_end_to_end(tiny_engine, tmp_path):
    path = str(tmp_path / "data.hdf5")
    traj_idx = _make_demo_hdf5(path)
    stats = label_rewards(path, "collect the coin.", engine=tiny_engine, progress=False)
    assert stats["frames"] == 30

    with h5py.File(path, "r") as g:
        assert set(g.keys()) >= {"ob", "act", "done", "ob_clip_reward", "ob_clip_pos_rtg"}
        reward = g["ob_clip_reward"][:]
        rtg = g["ob_clip_pos_rtg"][:]
        frames = g["ob"][:, -1]
        assert reward.shape == (30, 4) and rtg.shape == (30, 4)

    expected_r = _reference_rewards(tiny_engine, frames, "collect the coin.")
    for i in range(len(traj_idx) - 1):
        sl = slice(traj_idx[i], traj_idx[i + 1])
        r = expected_r[sl]
        np.testing.assert_allclose(reward[sl], stack_frames(r, 4), atol=1e-4)
        np.testing.assert_allclose(rtg[sl], stack_frames(discount_cumsum(r), 4), atol=1e-4)
    # MAE well under the 1e-4 target
    mae = np.abs(reward[:, -1] - expected_r).mean()
    assert mae < 1e-4, f"reward MAE {mae} exceeds target"


def test_labeler_overwrite_existing(tiny_engine, tmp_path):
    path = str(tmp_path / "data.hdf5")
    _make_demo_hdf5(path)
    label_rewards(path, "collect the coin.", engine=tiny_engine, progress=False)
    with h5py.File(path, "r") as g:
        first = g["ob_clip_reward"][:]
    label_rewards(path, "collect the coin.", engine=tiny_engine, progress=False)
    with h5py.File(path, "r") as g:
        second = g["ob_clip_reward"][:]
    np.testing.assert_allclose(first, second)


def test_stack_frames_matches_reference_deque():
    from collections import deque

    values = np.arange(7, dtype=np.float32)
    num_frames = 4
    expected = []
    stack = deque([], maxlen=num_frames)
    for i in range(len(values)):
        if i == 0:
            stack.extend([values[i]] * num_frames)
        else:
            stack.append(values[i])
        expected.append(list(stack))
    np.testing.assert_array_equal(stack_frames(values, num_frames), np.asarray(expected))


def test_discount_cumsum_gamma():
    x = np.array([1.0, 2.0, 3.0], np.float32)
    np.testing.assert_allclose(discount_cumsum(x, 1.0), [6, 5, 3])
    np.testing.assert_allclose(discount_cumsum(x, 0.5), [1 + 0.5 * (2 + 0.5 * 3), 2 + 1.5, 3])


def test_labeler_time_keyed_boundaries(tiny_engine, tmp_path):
    """Files without done/rewards use the `time` dataset for traj boundaries."""
    path = str(tmp_path / "data.hdf5")
    rng = np.random.default_rng(8)
    n, f = 12, 4
    with h5py.File(path, "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, f, 32, 32, 3), dtype=np.uint8))
        time = np.zeros((n, f, 1), np.float32)
        time[0, -1, 0] = 1.0  # trajectory starts at 0 and 6
        time[6, -1, 0] = 1.0
        g.create_dataset("time", data=time)
    stats = label_rewards(path, "collect the coin.", engine=tiny_engine, progress=False)
    assert stats["frames"] == 12
    with h5py.File(path, "r") as g:
        rtg = g["ob_clip_pos_rtg"][:, -1]
        rew = g["ob_clip_reward"][:, -1]
        assert rtg.shape == (12,)
        # the cumsum must RESET at the time-keyed boundary (index 6): each
        # trajectory's rtg is the discounted suffix-sum of ITS OWN rewards
        from arp_tpu.ops.rewards import discount_cumsum

        np.testing.assert_allclose(rtg[:6], discount_cumsum(rew[:6], 1.0), rtol=1e-5)
        np.testing.assert_allclose(rtg[6:], discount_cumsum(rew[6:], 1.0), rtol=1e-5)
        # single-trajectory treatment (no reset) would differ at the tail of traj 0
        assert not np.allclose(rtg, discount_cumsum(rew, 1.0))


def test_host_resize_mode_bit_identical(tiny_engine):
    """resize_mode="host" (C++ host resize + producer pipeline) must produce
    the same rewards as the on-device bit-exact path."""
    host_engine = ClipRewardEngine(
        model=tiny_engine.model,
        variables=tiny_engine.variables,
        batch_size=8,
        resize_mode="host",
        image_size=IMG_SIZE,
        tokenizer=TinyTokenizer(),
    )
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (21, 64, 64, 3), np.uint8)  # non-multiple of batch
    got = host_engine.text_rewards(frames, "collect the coin")
    want = tiny_engine.text_rewards(frames, "collect the coin")
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(
        host_engine.goal_rewards(frames), tiny_engine.goal_rewards(frames)
    )


def test_host_resize_matches_pillow_bit_exact():
    from arp_tpu.ops.preprocess import resize_bicubic_pil_host

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (5, 96, 80, 3), np.uint8)
    got = resize_bicubic_pil_host(imgs, 32, 48)
    want = np.stack(
        [np.asarray(Image.fromarray(im).resize((48, 32), Image.BICUBIC)) for im in imgs]
    )
    np.testing.assert_array_equal(got, want)


def test_host_resize_numpy_fallback_matches_native():
    import arp_tpu.data.arps as arps_mod
    from arp_tpu.ops.preprocess import resize_bicubic_pil_host

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 64, 64, 3), np.uint8)
    native = resize_bicubic_pil_host(imgs, 32, 32)
    # force the pure-numpy path
    saved = arps_mod._LIB, arps_mod._LIB_TRIED
    arps_mod._LIB, arps_mod._LIB_TRIED = None, True
    try:
        fallback = resize_bicubic_pil_host(imgs, 32, 32)
    finally:
        arps_mod._LIB, arps_mod._LIB_TRIED = saved
    np.testing.assert_array_equal(native, fallback)


def test_eval_crop_happens_exactly_once(tiny_engine):
    """compute_step_reward's host-side crop + an engine WITHOUT use_crop must
    equal the labeler's engine-side single crop — regression for a
    double-crop in the eval reward path (reference crops once,
    vl_reward.py:13-15)."""
    from arp_tpu.envs.rollout import compute_step_reward

    model, variables = tiny_engine.model, tiny_engine.variables
    crop_engine = ClipRewardEngine(
        model=model, variables=variables, batch_size=8, resize_mode="pil",
        image_size=IMG_SIZE, tokenizer=TinyTokenizer(), use_crop=True,
    )
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    # labeler semantics: engine crops internally, full frame in
    want = float(crop_engine.text_rewards(frame[None], "get the coin")[0])
    # eval semantics: host crop in compute_step_reward, engine must NOT crop
    got = compute_step_reward(
        tiny_engine, "clip", frame, text="get the coin", use_crop=True
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_labeler_default_path_matches_collect_contract(tmp_path):
    """The labeler's derived default path must be exactly what the collect
    stage writes (dirname incl. _unfiltered/env_type suffixes + data_{split})."""
    from types import SimpleNamespace

    from arp_tpu.data.procgen_dataset import dataset_dirname
    from arp_tpu.reward.labeler import default_data_path

    args = SimpleNamespace(
        env_name="coinrun", distribution_mode="hard", start_level=0,
        num_levels=500, num_demonstrations=500, num_frames=8,
        enable_filter=True, env_type="aisc", base_path="./demos", split="val",
    )
    got = default_data_path(args)
    want_dir = dataset_dirname(
        "coinrun", "hard", 0, 500, 500, 8, enable_filter=True, env_type="aisc"
    )
    assert got == os.path.join("./demos", want_dir, "data_val.hdf5")
    assert want_dir.endswith("_aisc")
    args.enable_filter = False
    assert "_unfiltered" in default_data_path(args)


def test_labeler_streams_host_memory_o_batch(tmp_path):
    """VERDICT r2 item 2: labeling a 100k-row file must keep host RSS O(batch),
    not O(file).  The frame dataset is chunked but never written (HDF5 fill
    value), so an eager ``g[key][:, -1]`` would materialize ~2.6 GB while the
    streamed path reads 256-row windows.  Runs in a subprocess so ru_maxrss
    reflects only this workload."""
    import subprocess
    import sys
    import textwrap

    from tests.cli_env import make_cli_env

    script = textwrap.dedent(
        """
        import resource, sys
        import h5py, numpy as np

        path = sys.argv[1]
        N, F, S = 100_000, 2, 96
        with h5py.File(path, "w") as g:
            # chunked + unwritten: reads return the fill value, nothing on disk
            g.create_dataset("ob", shape=(N, F, S, S, 3), dtype="u1",
                             chunks=(256, 1, S, S, 3))
            done = np.zeros((N, F), bool)
            done[999::1000] = True
            g.create_dataset("done", data=done)

        class DummyEngine:
            batch_size = 256
            def text_rewards(self, frames, text):
                out = np.zeros(frames.shape[0], np.float32)
                for s in range(0, frames.shape[0], self.batch_size):
                    chunk = np.asarray(frames[s : s + self.batch_size])
                    out[s : s + chunk.shape[0]] = chunk.reshape(chunk.shape[0], -1)[:, 0]
                return out

        from arp_tpu.reward.labeler import label_rewards
        base_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        stats = label_rewards(path, "x", engine=DummyEngine(), progress=False)
        assert stats["frames"] == N, stats
        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(f"BASE_MB={base_mb:.0f} PEAK_MB={peak_mb:.0f}")
        # delta-based: the interpreter/XLA baseline varies wildly with machine
        # load (observed 0.4-6 GB), but labeling itself must add O(batch).
        # An eager g[key][:, -1] would add ~2.6 GB on top of ANY baseline.
        delta_mb = peak_mb - base_mb
        assert delta_mb < 1000, (
            f"labeler materialized the file: +{delta_mb:.0f} MB over the "
            f"{base_mb:.0f} MB baseline"
        )
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script, str(tmp_path / "big.hdf5")],
        env=make_cli_env(), capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr + out.stdout
    assert "PEAK_MB=" in out.stdout


def test_mesh_sharded_engine_matches_single_device(tiny_engine):
    """mesh=8-device GSPMD data parallelism must reproduce the single-device
    rewards exactly: the encode is per-image independent, so sharding the
    batch dim changes placement, not arithmetic."""
    from arp_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp=-1))
    mesh_engine = ClipRewardEngine(
        model=tiny_engine.model,
        variables=tiny_engine.variables,
        batch_size=8,
        resize_mode="pil",
        image_size=IMG_SIZE,
        tokenizer=TinyTokenizer(),
        mesh=mesh,
    )
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (19, 64, 64, 3), np.uint8)  # non-multiple of batch
    np.testing.assert_array_equal(
        mesh_engine.text_rewards(frames, "collect the coin."),
        tiny_engine.text_rewards(frames, "collect the coin."),
    )
    np.testing.assert_array_equal(
        mesh_engine.goal_rewards(frames), tiny_engine.goal_rewards(frames)
    )


def test_mesh_sharded_fast_int8_runs_calibration(tiny_engine):
    """The lazy int8 calibration + quantized encode must work under the mesh
    (sharded calibration batch, replicated quantized pack)."""
    from arp_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp=-1))
    eng = ClipRewardEngine(
        model=tiny_engine.model,
        variables=tiny_engine.variables,
        batch_size=8,
        resize_mode="pil",
        image_size=IMG_SIZE,
        tokenizer=TinyTokenizer(),
        fast_int8=True,
        mesh=mesh,
    )
    rng = np.random.default_rng(12)
    frames = rng.integers(0, 256, (16, 64, 64, 3), np.uint8)
    got = eng.text_rewards(frames, "collect the coin.")
    want = tiny_engine.text_rewards(frames, "collect the coin.")
    assert eng._fast_q is not None  # calibration ran
    # int8 path is approximate; bound the drift, don't expect equality
    assert np.max(np.abs(got - want)) < 0.15 * max(1.0, np.max(np.abs(want)))


def test_mesh_engine_rejects_indivisible_batch(tiny_engine):
    from arp_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp=-1))
    with pytest.raises(AssertionError, match="divisible"):
        ClipRewardEngine(
            model=tiny_engine.model,
            variables=tiny_engine.variables,
            batch_size=12,  # not divisible by 8 devices
            resize_mode="pil",
            image_size=IMG_SIZE,
            tokenizer=TinyTokenizer(),
            mesh=mesh,
        )


def test_lane_hostile_batch_rounded_up():
    """VERDICT r4 weak #5: a lane-hostile resident batch (B=48 measured 2.3x
    slower than 64-multiples on the v5e) is rounded up with a warning;
    aligned and tiny dev sizes pass through untouched."""
    import warnings

    from arp_tpu.models.clip import CLIP
    from arp_tpu.models.clip.tokenizer import Char97Tokenizer
    import jax, jax.numpy as jnp

    model = CLIP(embed_dim=32, vocab_size=97, vision_num_layers=2, vision_features=64,
                 vision_patch_size=8, text_features=32, text_num_heads=4, text_num_layers=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
                           jnp.zeros((1, 77), jnp.int32))

    def make(bs):
        return ClipRewardEngine(model=model, variables=variables, batch_size=bs,
                                image_size=32, tokenizer=Char97Tokenizer())

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        eng = make(48)
    assert eng.batch_size == 64
    assert any("lane-hostile" in str(x.message) for x in w)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert make(128).batch_size == 128
        assert make(8).batch_size == 8  # tiny dev size untouched
    assert not any("lane-hostile" in str(x.message) for x in w)
