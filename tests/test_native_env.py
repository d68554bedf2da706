"""Native C++ grid engine (envs/native_engine.py + native/gridenv.cpp):
bitwise parity with the Python gym3 stub, blob interchange, and the Procgen
wrapper running on the native core.

The reference's environments are C++ Procgen forks behind gym3
(data/PPG/collect_procgen_data.py); this is the arp_tpu stand-in proving the
same Python<->native engine glue with a native vectorized hot path."""

import numpy as np
import pytest

from arp_tpu.envs.gym3_stub import FakeProcgenGym3, place_entities
from arp_tpu.envs.native_engine import NativeProcgenGym3, native_lib

pytestmark = pytest.mark.skipif(native_lib() is None, reason="libgridenv.so unavailable")

CTOR = dict(game_name="coinrun", num=3, resolution=32, grid=5,
            episode_length=7, num_levels=10, start_level=2, rand_seed=11)


def test_episode_stream_bitwise_parity():
    """Same ctor -> identical (rew, rgb, first) streams across auto-resets."""
    py = FakeProcgenGym3(**CTOR)
    nat = NativeProcgenGym3(**CTOR)
    rng = np.random.default_rng(0)
    for step in range(40):  # 40 steps x len-7 episodes: many auto-resets
        rew_p, obs_p, first_p = py.observe()
        rew_n, obs_n, first_n = nat.observe()
        np.testing.assert_array_equal(rew_p, rew_n, err_msg=f"step {step}")
        np.testing.assert_array_equal(first_p, first_n, err_msg=f"step {step}")
        np.testing.assert_array_equal(obs_p["rgb"], obs_n["rgb"], err_msg=f"step {step}")
        ac = rng.integers(0, 6, size=CTOR["num"])  # incl. out-of-range no-ops
        py.act(ac)
        nat.act(ac)
    assert nat.episode_counter == py._episode_counter


def test_state_blobs_identical_and_interchangeable():
    py = FakeProcgenGym3(**CTOR)
    nat = NativeProcgenGym3(**CTOR)
    acts = np.array([1, 3, 0])
    py.act(acts)
    nat.act(acts)
    blobs_p = py.callmethod("get_state")
    blobs_n = nat.callmethod("get_state")
    assert blobs_p == blobs_n  # byte-identical wire format

    # cross-restore: python blob into native engine and vice versa
    other = NativeProcgenGym3(**{**CTOR, "rand_seed": 99})
    other.callmethod("set_state", blobs_p)
    assert other.callmethod("get_state") == blobs_p
    py2 = FakeProcgenGym3(**{**CTOR, "rand_seed": 99})
    py2.set_state(blobs_n)
    assert py2.get_state() == blobs_n
    # restored engines step identically afterwards
    other.act(acts)
    py2.act(acts)
    rew_n, obs_n, _ = other.observe()
    rew_p, obs_p, _ = py2.observe()
    np.testing.assert_array_equal(rew_p, rew_n)
    np.testing.assert_array_equal(obs_p["rgb"], obs_n["rgb"])


def test_dual_resolution_restore_native():
    """The collect dual-res trick on the native engine: a high-res blob
    restored into a low-res native venv renders the same logical scene."""
    hi = NativeProcgenGym3(game_name="coinrun", num=1, resolution=64, grid=4, rand_seed=7)
    lo = NativeProcgenGym3(game_name="coinrun", num=1, resolution=16, grid=4, rand_seed=99)
    hi.act(np.array([1]))
    lo.callmethod("set_state", hi.callmethod("get_state"))
    _, hi_obs, _ = hi.observe()
    _, lo_obs, _ = lo.observe()
    small = hi_obs["rgb"][0].reshape(16, 4, 16, 4, 3)[:, 0, :, 0]
    np.testing.assert_array_equal(small, lo_obs["rgb"][0])


def test_procgen_wrapper_on_native_engine(monkeypatch):
    monkeypatch.setenv("ARP_TPU_FAKE_ENGINE", "native")
    from arp_tpu.envs.procgen import Procgen

    env = Procgen("coinrun", {"episode_length": 10, "use_train_levels": True},
                  image_resolution="high")
    obs = env.reset(3)
    assert obs["image"]["ob"].shape == (256, 256, 3)
    state = env.get_state()
    assert isinstance(state, list) and isinstance(state[0], bytes)
    obs2 = env.set_state(state)
    np.testing.assert_array_equal(obs["image"]["ob"], obs2["image"]["ob"])
    obs3, r, done, info = env.step(1)
    assert obs3["image"]["ob"].shape == (256, 256, 3)


def test_placement_matches_python_helper():
    """grid_create's initial layouts equal place_entities(seed, grid)."""
    nat = NativeProcgenGym3(game_name="maze", num=4, resolution=8, grid=9,
                            num_levels=1000, start_level=50, rand_seed=0, env_type="aisc")
    nat._refresh_core()
    for i in range(4):
        ay, ax, gy, gx = place_entities(50 + i, 9)
        assert tuple(nat._agent[i]) == (ay, ax)
        assert tuple(nat._goal[i]) == (gy, gx)
        assert nat._seed[i] == 50 + i
