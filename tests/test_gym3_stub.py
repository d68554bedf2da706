"""gym3-faithful engine stub (VERDICT r2 item 6): real state-codec blobs
through the exact glue the real engine will hit — Procgen wrapper branches,
dual-res collect, downsize engine replay, goal-conditioned state restore."""

import os
import subprocess
import sys

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.envs.gym3_stub import FakeProcgenGym3, make_fake_gym_env
from arp_tpu.envs.state_codec import decode_state, encode_state


@pytest.mark.parametrize("game,env_type", [("coinrun", "none"), ("maze", "aisc"), ("coinrun_aisc", "aisc")])
def test_stub_states_are_real_engine_blobs(game, env_type):
    core = FakeProcgenGym3(game_name=game, num=2, resolution=32, grid=4, env_type=env_type)
    states = core.callmethod("get_state")
    assert len(states) == 2 and all(isinstance(s, bytes) for s in states)
    for blob in states:
        data = decode_state(blob, env_type=env_type)  # full schema parses
        assert data["game_name"] == game.split("_")[0]
        assert len(data["entities"]) == 2
        # wire-format round trip is byte-identical
        assert encode_state(data, env_type=env_type) == blob


def test_stub_set_state_restores_scene_across_resolutions():
    """The dual-res trick: a high-res state blob restored into a low-res venv
    renders the same logical scene (collect_procgen_data.py:85-89)."""
    hi = FakeProcgenGym3(game_name="coinrun", num=1, resolution=64, grid=4, rand_seed=7)
    lo = FakeProcgenGym3(game_name="coinrun", num=1, resolution=16, grid=4, rand_seed=99)
    hi.act(np.array([1]))
    states = hi.callmethod("get_state")
    lo.callmethod("set_state", states)
    _, hi_obs, _ = hi.observe()
    _, lo_obs, _ = lo.observe()
    # block-downsample the high frame: scene structure must match exactly
    small = hi_obs["rgb"][0].reshape(16, 4, 16, 4, 3)[:, 0, :, 0]
    np.testing.assert_array_equal(small, lo_obs["rgb"][0])
    assert lo._t[0] == hi._t[0] and lo._seed[0] == hi._seed[0]


def test_procgen_wrapper_real_branches(monkeypatch):
    """With ARP_TPU_FAKE_ENGINE=1 the Procgen wrapper constructs, steps, and
    moves blob states through its real inner-env discovery + observe path."""
    monkeypatch.setenv("ARP_TPU_FAKE_ENGINE", "1")
    from arp_tpu.envs.procgen import Procgen

    hi = Procgen("coinrun", {"episode_length": 10, "use_train_levels": True}, image_resolution="high")
    lo = Procgen("coinrun", {"episode_length": 10, "use_train_levels": True}, image_resolution="low")
    obs = hi.reset(3)
    assert obs["image"]["ob"].shape == (256, 256, 3)
    state = hi.get_state()
    assert isinstance(state, list) and isinstance(state[0], bytes)
    lo.reset(5)
    lo_obs = lo.set_state(state)  # blob restore + re-render at 64x64
    assert lo_obs["image"]["ob"].shape == (64, 64, 3)
    small = obs["image"]["ob"].reshape(64, 4, 64, 4, 3)[:, 0, :, 0]
    np.testing.assert_array_equal(small, lo_obs["image"]["ob"])
    obs2, r, done, info = hi.step(1)
    assert obs2["image"]["ob"].shape == (256, 256, 3)


def _run_dual_res_collect(tmp_path):
    from tests.cli_env import make_cli_env

    env = make_cli_env()
    env["ARP_TPU_FAKE_ENGINE"] = "1"
    out = subprocess.run(
        [
            sys.executable, "-m", "arp_tpu.collect.collect",
            "--game_name=coinrun", "--num_episodes=2", "--num_frames=4",
            "--episode_length=200", "--enable_filter=False", "--dual_res=True",
            "--num_levels=10", f"--out_dir={tmp_path}", "--seed=1",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    ddir = os.path.join(
        str(tmp_path), "coinrun_hard_level0to10_num2_frame4_unfiltered"
    )
    with h5py.File(os.path.join(ddir, "data_train.hdf5"), "r") as g:
        assert g["ob"].shape[2:] == (256, 256, 3)  # recorder stored HIGH res
        n = g["ob"].shape[0]
        assert n > 0
    # engine states were saved per episode and are real blobs
    states = np.load(os.path.join(ddir, "traj_state_0.npy"), allow_pickle=True)
    blob = states[0][0] if isinstance(states[0], (list, np.ndarray)) else states[0]
    assert decode_state(bytes(blob))["game_name"] == "coinrun"
    return ddir


def test_collect_dual_res_cli(tmp_path):
    """collect --dual_res against the stub engine: the policy reads the
    low-res paired env synced via set_state, the recorder stores high-res."""
    _run_dual_res_collect(tmp_path)


def test_downsize_replay_cli(tmp_path):
    """downsize --mode replay: restore every saved blob into a low-res stub
    engine and re-render 64x64 frames aligned with the original rows."""
    from tests.cli_env import make_cli_env

    ddir = _run_dual_res_collect(tmp_path)
    env = make_cli_env()
    env["ARP_TPU_FAKE_ENGINE"] = "1"
    out_path = os.path.join(str(tmp_path), "low.hdf5")
    out = subprocess.run(
        [
            sys.executable, "-m", "arp_tpu.collect.downsize",
            f"--data_path={os.path.join(ddir, 'data_train.hdf5')}",
            f"--out_path={out_path}", "--mode=replay", "--game_name=coinrun",
        ],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    with h5py.File(os.path.join(ddir, "data_train.hdf5"), "r") as g, h5py.File(out_path, "r") as low:
        assert low["ob"].shape[0] == g["ob"].shape[0]
        assert low["ob"].shape[2:] == (64, 64, 3)
        # replayed low-res frames match block-downsampled originals
        hi0 = g["ob"][0, -1]
        lo0 = low["ob"][0, -1]
        np.testing.assert_array_equal(hi0.reshape(64, 4, 64, 4, 3)[:, 0, :, 0], lo0)


def test_goal_conditioned_eval_state_restore_via_stub(tmp_path, monkeypatch):
    """batch_rollout's eval_data_path branch restores engine-blob states into
    the Procgen wrapper exactly as with the real engine."""
    monkeypatch.setenv("ARP_TPU_FAKE_ENGINE", "1")
    from arp_tpu.collect.recorder import collect_demonstrations
    from arp_tpu.envs.procgen import Procgen
    from arp_tpu.envs.rollout import batch_rollout

    env = Procgen("coinrun", {"episode_length": 100, "use_train_levels": True}, image_resolution="high")
    rng = np.random.default_rng(0)
    data_path = str(tmp_path / "data_test.hdf5")
    rec = collect_demonstrations(
        env, lambda obs: int(rng.integers(0, 4)), data_path,
        num_episodes=2, game_name="coinrun", num_frames=4, seed=0,
        success_filter=True, max_episode_length=100,
    )
    assert rec.num_recorded == 2

    def policy_fn(inputs, rngs):
        assert "goal" in inputs
        return jnp.zeros((1,), jnp.int32)

    env2 = Procgen("coinrun", {"episode_length": 100, "use_train_levels": True}, image_resolution="high")
    metric, info, videos = batch_rollout(
        rng=jax.random.PRNGKey(0), data_aug_rng=jax.random.PRNGKey(1),
        env=env2, policy_fn=policy_fn, episode_length=3, window_size=4,
        num_episodes=2, return_to_go=10.0, scale=10.0,
        eval_data_path=str(tmp_path), data_name="data_test.hdf5",
    )
    assert np.isfinite(float(metric["return"]))
