"""Env wrapper, state codec, and rollout engine tests (engine-free FakeProcgen)."""

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.envs.fake import FakeProcgen
from arp_tpu.envs.rollout import batch_rollout, parallel_rollout
from arp_tpu.envs.state_codec import decode_state, encode_state


def _sample_state(game="coinrun"):
    ent = {name: (1 if kind == "i" else 0.5) for name, kind in
           __import__("arp_tpu.envs.state_codec", fromlist=["ENTITY_SCHEMA"]).ENTITY_SCHEMA}
    data = {
        "SERIALIZE_VERSION": 1, "game_name": game,
        "paint_vel_info": 0, "use_generated_assets": 0, "use_monochrome_assets": 0,
        "restrict_themes": 0, "use_backgrounds": 1, "center_agent": 0, "debug_mode": 0,
        "distribution_mode": 2, "use_sequential_levels": 0,
        "use_easy_jump": 0, "plain_assets": 0, "physics_mode": 0,
        "grid_step": 0, "level_seed_low": 0, "level_seed_high": 100, "game_type": 1, "game_n": 2,
        "level_seed_is_seeded": 1, "level_seed_str": "13 37",
        "rand_is_seeded": 1, "rand_str": "4 8 15 16 23 42",
        "step_data_reward": 0.0, "step_data_done": 0, "step_data_level_complete": 0,
        "action": 3, "timeout": 1000, "current_level_seed": 7, "prev_level_seed": 6,
        "episodes_remaining": 1, "episodes_done": 4, "last_reward_timer": 0,
        "last_reward": 1.5, "default_action": 0, "fixed_asset_seed": 0,
        "cur_time": 12, "is_waiting_for_sleep": 0, "grid_size": 4,
        "entities": [ent, ent], "use_procgen_background": 1, "background_index": 3,
        "bg_tile_ratio": 0.5, "bg_pct_x": 0.25, "char_dim": 1.0,
        "last_move_action": 1, "move_action": 2, "special_action": 0,
        "mixrate": 0.9, "maxspeed": 1.0, "max_jump": 1.5,
        "action_vx": 0.0, "action_vy": 0.0, "action_vrot": 0.0,
        "center_x": 5.0, "center_y": 5.0, "random_agent_start": 0,
        "has_useful_vel_info": 1, "step_rand_int": 99,
        "asset_rand_is_seeded": 0, "asset_rand_str": "7 7 7",
        "main_width": 64, "main_height": 64, "out_of_bounds_object": 1,
        "unit": 1.0, "view_dim": 10.0, "x_off": 0.0, "y_off": 0.0,
        "visibility": 1.0, "min_visibility": 0.0,
        "grid_w": 2, "grid_h": 2, "grid_data": [1, 2, 3, 4],
    }
    if "coinrun" in game:
        data.update(last_agent_y=3.0, wall_theme=1, has_support=True,
                    facing_right=False, is_on_crate=True, gravity=0.2, air_control=0.15)
    else:
        data.update(maze_dim=9, world_dim=25)
    return data


def test_state_codec_roundtrip_coinrun():
    data = _sample_state("coinrun")
    blob = encode_state(data)
    back = decode_state(blob)
    for k, v in data.items():
        if isinstance(v, float):
            assert abs(back[k] - v) < 1e-6, k
        else:
            assert back[k] == v, k


def test_state_codec_roundtrip_maze_aisc():
    data = _sample_state("maze_aisc")
    data.update(random_percent=50, key_penalty=0, step_penalty=0, rand_region=5, continue_after_coin=0)
    blob = encode_state(data)
    back = decode_state(blob)
    assert back["maze_dim"] == 9 and back["random_percent"] == 50


def test_fake_env_interface():
    env = FakeProcgen("coinrun", {"episode_length": 20, "image_size": 32, "grid": 4})
    obs = env.reset(0)
    assert obs["image"]["ob"].shape == (32, 32, 3)
    assert obs["image"]["ob"].dtype == np.uint8
    done = False
    steps = 0
    while not done and steps < 25:
        obs, r, done, info = env.step(np.random.default_rng(steps).integers(0, 15))
        steps += 1
    assert done
    assert info["vid"] is not None  # record_every=1
    # state save/restore
    env.reset(1)
    st = env.get_state()
    env.step(1)
    env.set_state(st)
    assert np.array_equal(env.get_state()["agent"], st["agent"])


def _random_policy(n_actions=15):
    calls = {"n": 0}

    def policy_fn(inputs, rngs):
        calls["n"] += 1
        b = inputs["action"].shape[0]
        assert inputs["image"]["ob"].ndim == 5  # (B, W, H, W, C)
        assert "rtg" in inputs
        return jnp.asarray(np.random.default_rng(calls["n"]).integers(0, 4, size=(b,)))

    return policy_fn, calls


def test_batch_rollout_fake_env():
    env = FakeProcgen("coinrun", {"episode_length": 15, "image_size": 32, "grid": 4})
    policy_fn, calls = _random_policy()
    metric, info, videos = batch_rollout(
        rng=jax.random.PRNGKey(0),
        data_aug_rng=jax.random.PRNGKey(1),
        env=env,
        policy_fn=policy_fn,
        transform_obs_fn=None,
        episode_length=15,
        window_size=4,
        num_episodes=2,
        return_to_go=100.0,
        scale=100.0,
        reward_engine=None,
    )
    assert set(metric) == {"return", "episode_length", "success_rate"}
    assert 0.0 <= float(metric["success_rate"]) <= 1.0
    assert calls["n"] > 0
    assert len(videos) >= 1


def test_batch_rollout_with_reward_engine(tmp_path):
    """rtg must be decremented by the CLIP reward each step."""
    from tests.test_reward_engine import tiny_engine as tiny_engine_fixture  # reuse builder

    # construct the tiny engine directly (fixture fn is a pytest fixture)
    from arp_tpu.models.clip import CLIP
    from arp_tpu.reward.engine import ClipRewardEngine
    from tests.test_reward_engine import TINY_CFG, IMG_SIZE, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32))
    text = jnp.asarray(TinyTokenizer()("x"))
    variables = model.init(jax.random.PRNGKey(0), img, text)
    engine = ClipRewardEngine(
        model=model, variables=variables, batch_size=4, resize_mode="pil",
        image_size=IMG_SIZE, tokenizer=TinyTokenizer(),
    )

    env = FakeProcgen("coinrun", {"episode_length": 5, "image_size": 32, "grid": 4})
    seen_rtgs = []

    def policy_fn(inputs, rngs):
        seen_rtgs.append(float(np.asarray(inputs["rtg"]["ob"])[0, -1]))
        return jnp.zeros((1,), jnp.int32)

    metric, info, videos = batch_rollout(
        rng=jax.random.PRNGKey(0), data_aug_rng=jax.random.PRNGKey(1),
        env=env, policy_fn=policy_fn, episode_length=5, window_size=4,
        num_episodes=1, return_to_go=100.0, scale=100.0,
        reward_engine=engine, vl_type="clip", text="collect the coin.",
    )
    # rtg strictly changes once rewards flow
    assert len(seen_rtgs) >= 2
    assert seen_rtgs[1] != seen_rtgs[0]


def test_parallel_rollout():
    envs = [FakeProcgen("coinrun", {"episode_length": 10, "image_size": 32, "grid": 3}) for _ in range(4)]

    def policy_fn(inputs, rngs):
        b = inputs["action"].shape[0]
        # deterministic sweep policy: move right then down
        return jnp.asarray(np.tile([1, 3], b)[:b])

    metric = parallel_rollout(
        rng=jax.random.PRNGKey(0), envs=envs, policy_fn=policy_fn,
        episode_length=10, window_size=4, return_to_go=10.0, scale=10.0,
    )
    assert set(metric) == {"return", "episode_length", "success_rate"}
    assert 0.0 <= float(metric["success_rate"]) <= 1.0


def test_batch_rollout_goal_conditioned_state_restore(tmp_path):
    """eval_with_goal path: restore saved engine states, attach goal images."""
    from arp_tpu.collect.recorder import collect_demonstrations

    env = FakeProcgen("coinrun", {"episode_length": 20, "image_size": 16, "grid": 3})
    rng = np.random.default_rng(0)
    data_path = str(tmp_path / "data_test.hdf5")
    rec = collect_demonstrations(
        env, lambda obs: int(rng.integers(0, 4)), data_path,
        num_episodes=2, game_name="coinrun", num_frames=4, seed=0,
    )
    assert rec.num_recorded == 2

    goals_seen = []

    def policy_fn(inputs, rngs):
        assert "goal" in inputs, "goal image must be part of the inputs"
        goals_seen.append(np.asarray(inputs["goal"]["ob"])[0, -1])
        return jnp.zeros((1,), jnp.int32)

    env2 = FakeProcgen("coinrun", {"episode_length": 20, "image_size": 16, "grid": 3})
    metric, info, videos = batch_rollout(
        rng=jax.random.PRNGKey(0), data_aug_rng=jax.random.PRNGKey(1),
        env=env2, policy_fn=policy_fn, episode_length=3, window_size=4,
        num_episodes=2, return_to_go=10.0, scale=10.0,
        eval_data_path=str(tmp_path), data_name="data_test.hdf5",
    )
    assert len(goals_seen) > 0
    # the goal image equals the recorded last frame of each eval trajectory
    import h5py

    with h5py.File(data_path, "r") as g:
        idx = list(np.nonzero(g["done"][:, -1])[0] + 1)
        expected_goal = g["ob"][idx[0] - 1, -1]
    np.testing.assert_array_equal(goals_seen[0], expected_goal)


def test_parallel_rollout_goal_conditioned():
    from arp_tpu.models.clip import CLIP
    from arp_tpu.reward.engine import ClipRewardEngine
    from tests.test_reward_engine import IMG_SIZE, TINY_CFG, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32)),
        jnp.asarray(TinyTokenizer()("x")),
    )
    engine = ClipRewardEngine(
        model=model, variables=variables, batch_size=4, resize_mode="pil",
        image_size=IMG_SIZE, tokenizer=TinyTokenizer(),
    )
    envs = [FakeProcgen("coinrun", {"episode_length": 4, "image_size": 32, "grid": 3}) for _ in range(2)]
    goals = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)

    def policy_fn(inputs, rngs):
        return jnp.zeros((inputs["action"].shape[0],), jnp.int32)

    metric = parallel_rollout(
        rng=jax.random.PRNGKey(0), envs=envs, policy_fn=policy_fn,
        episode_length=4, window_size=2, return_to_go=10.0, scale=10.0,
        reward_engine=engine, vl_type="clip_goal_conditioned", goal_images=goals,
    )
    assert np.isfinite(float(metric["return"]))


def test_parallel_rollout_rewards_use_prestep_frames():
    """rtg decrements must score the frame the policy acted on (pre-step),
    matching batch_rollout and the reference (rollout_procgen.py:134-150) —
    regression for a post-step off-by-one."""
    cfg = {"episode_length": 6, "image_size": 16, "grid": 3}
    envs = [FakeProcgen("coinrun", cfg) for _ in range(2)]
    expected_first = [
        np.asarray(FakeProcgen("coinrun", cfg).reset(e.config.rand_seed + i)["image"]["ob"])
        for i, e in enumerate(envs)
    ]

    class StubEngine:
        def __init__(self):
            self.frames_seen = []

        def encode_text_features(self, text):
            return np.ones((1, 4), np.float32)

        def text_rewards_with_features(self, frames, txt_feat):
            self.frames_seen.append(np.asarray(frames).copy())
            return np.zeros(frames.shape[0], np.float32)

    stub = StubEngine()

    def policy_fn(inputs, rngs):
        return jnp.ones((inputs["action"].shape[0],), jnp.int32)

    parallel_rollout(
        rng=jax.random.PRNGKey(0), envs=envs, policy_fn=policy_fn,
        episode_length=3, window_size=2, return_to_go=10.0, scale=10.0,
        reward_engine=stub, vl_type="clip", text="dummy",
    )
    assert stub.frames_seen, "reward engine was never called"
    first = stub.frames_seen[0]
    for i in range(2):
        np.testing.assert_array_equal(first[i], expected_first[i])


def test_parallel_rollout_inputs_match_batch_rollout():
    """r3 review: the action window must pair a_k with obs_k and carry the 0
    placeholder in the current slot — exactly what batch_rollout feeds the
    policy.  Compare the inputs both paths present to the SAME deterministic
    policy on the same env seed, step by step."""
    seen_seq, seen_par = [], []

    def make_policy(sink):
        counter = {"t": 0}

        def policy_fn(inputs, rngs):
            sink.append(
                (np.asarray(inputs["action"]).copy(), np.asarray(inputs["image"]["ob"]).copy())
            )
            b = np.asarray(inputs["action"]).shape[0]
            a = 1 + (counter["t"] % 3)  # deterministic non-trivial actions
            counter["t"] += 1
            return jnp.full((b,), a, jnp.int32)

        return policy_fn

    conf = {"episode_length": 6, "image_size": 16, "grid": 5, "rand_seed": 42}
    batch_rollout(
        rng=jax.random.PRNGKey(0), data_aug_rng=jax.random.PRNGKey(1),
        env=FakeProcgen("coinrun", dict(conf)), policy_fn=make_policy(seen_seq),
        episode_length=6, window_size=3, num_episodes=1,
        return_to_go=10.0, scale=10.0,
    )
    parallel_rollout(
        rng=jax.random.PRNGKey(0), envs=[FakeProcgen("coinrun", dict(conf))],
        policy_fn=make_policy(seen_par), episode_length=6, window_size=3,
        return_to_go=10.0, scale=10.0,
    )
    assert len(seen_seq) == len(seen_par), (len(seen_seq), len(seen_par))
    for t, ((act_s, img_s), (act_p, img_p)) in enumerate(zip(seen_seq, seen_par)):
        np.testing.assert_array_equal(act_p, act_s, err_msg=f"action window differs at t={t}")
        assert img_p.dtype == img_s.dtype, (img_p.dtype, img_s.dtype)
        np.testing.assert_array_equal(img_p, img_s, err_msg=f"image window differs at t={t}")
