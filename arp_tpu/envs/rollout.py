"""Evaluation rollouts: host env stepping + device policy + on-device rewards.

Redesign of the reference rollout loop (arp_dt/envs/rollout_procgen.py), whose
per-step chain is device(JAX policy, batch=1) -> host -> C++ env -> host ->
*separate torch CLIP on GPU* (batch=1) -> host.  Here:

  * the CLIP reward comes from the same JAX reward engine used for labeling
    (arp_tpu/reward/engine.py) — no torch, same weights as the labeler;
  * the input window is maintained as fixed-size host arrays; the policy_fn
    is jitted per window length (window_size distinct shapes, all cached);
  * `batch_rollout` preserves the reference's sequential semantics (one env,
    rtg decremented by the per-step CLIP reward / scale); `parallel_rollout`
    steps N env copies in lockstep so the policy and the reward model run
    with real batches — the TPU-native fast path.
"""

from __future__ import annotations

import copy
import os
from typing import Callable, Optional

import jax
import numpy as np


def _tree_map(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map(fn, v) for k, v in tree.items()}
    return fn(tree)


def _tree_map2(fn, a, b):
    if isinstance(a, dict):
        return {k: _tree_map2(fn, a[k], b[k]) for k in a}
    return fn(a, b)


def _crop_half(frames: np.ndarray) -> np.ndarray:
    """Center-crop to half size (reference label_reward.py:15-36 arithmetic);
    accepts batched (N, H, W, C) or a single (H, W, C) frame."""
    from ..ops.preprocess import center_crop_np

    single = frames.ndim == 3
    x = frames[None] if single else frames
    x = center_crop_np(x, x.shape[1] // 2, x.shape[2] // 2)
    return x[0] if single else x


def compute_step_reward(engine, vl_type: str, obs_image, text=None, goal_image=None, use_crop=False):
    """Per-step reward, same semantics as the reference vl_reward fns."""
    frames = np.asarray(obs_image)[None]
    if use_crop:
        frames = _crop_half(frames)
    if vl_type in ("clip", "clip_ft"):
        return float(engine.text_rewards(frames, text)[0])
    if vl_type in ("clip_goal_conditioned", "clip_ft_goal_conditioned"):
        goal = np.asarray(goal_image)
        if use_crop:
            goal = _crop_half(goal)
        return float(engine.goal_rewards_vs(frames, goal)[0])
    raise ValueError(vl_type)


def open_goal_eval(eval_data_path: str, data_name: str, num_episodes: int):
    """Open a goal-eval demo file and compute trajectory boundaries.

    Shared by batch_rollout and the parallel eval driver (train/common.py) so
    the boundary/goal conventions cannot diverge.  Returns (h5file, traj_idx);
    caller closes the file.
    """
    import h5py

    f = h5py.File(os.path.join(eval_data_path, data_name), "r")
    traj_idx = list(np.nonzero(f["done"][:, -1])[0] + 1)
    traj_idx.insert(0, 0)
    # needs one MORE boundary than episodes: episode ep reads traj_idx[ep + 1]
    # (the reference's plain >= IndexErrors on the final episode when counts
    # are exactly equal)
    assert len(traj_idx) - 1 >= num_episodes, (
        f"eval file has {len(traj_idx) - 1} trajectories < num_episodes {num_episodes}"
    )
    return f, traj_idx


def load_goal_and_state(eval_data_path: str, eval_hdf5, traj_idx, ep: int):
    """Episode ep's goal frame (last frame of its eval trajectory) and the
    engine state blob to restore at t=0 (traj_state_{ep}.npy row 0)."""
    goal = eval_hdf5["ob"][traj_idx[ep + 1] - 1, -1]
    state = np.load(
        os.path.join(eval_data_path, f"traj_state_{ep}.npy"), allow_pickle=True
    )[0]
    return goal, state


def batch_rollout(
    rng,
    data_aug_rng,
    env,
    policy_fn: Callable,
    transform_obs_fn: Optional[Callable] = None,
    transform_action_fn: Optional[Callable] = None,
    episode_length: int = 2500,
    window_size: int = 4,
    num_episodes: int = 1,
    return_to_go: float = 100.0,
    scale: float = 100.0,
    reward_engine=None,
    vl_type: str = "clip",
    text=None,
    reward_min=0.0,
    use_normalize: bool = False,
    use_crop: bool = False,
    eval_data_path: Optional[str] = None,
    data_name: str = "data.hdf5",
):
    """Sequential eval rollout (reference parity: rollout_procgen.py:24-182).

    Returns (metric, info, videos).
    """
    import h5py

    transform_action_fn = transform_action_fn or (lambda x: x)

    eval_hdf5 = None
    eval_traj_idx = None
    if eval_data_path is not None:
        eval_hdf5, eval_traj_idx = open_goal_eval(eval_data_path, data_name, num_episodes)

    batch_fn = lambda x: np.asarray(x)[None, None, ...]
    concat_fn = lambda a, b: np.concatenate([a, b], axis=1)
    trim_fn = lambda x: x[:, -window_size:, ...]

    def prepare_input(all_inputs, obs, rtg):
        action = np.zeros(1, dtype=np.int32)
        inputs = {**obs, "action": action, "rtg": rtg}
        inputs = _tree_map(batch_fn, inputs)
        inputs["action"] = inputs["action"].squeeze(-1)
        if len(all_inputs) != 0:
            inputs = _tree_map2(concat_fn, copy.deepcopy(all_inputs), inputs)
            inputs = _tree_map(trim_fn, inputs)
        return inputs

    def update_input(all_inputs, obs, action, rtg):
        inputs = {**obs, "action": action, "rtg": rtg}
        inputs = _tree_map(batch_fn, inputs)
        if len(all_inputs) == 0:
            return inputs
        all_inputs = _tree_map2(concat_fn, all_inputs, inputs)
        return _tree_map(trim_fn, all_inputs)

    image_keys = env.config.image_key.split(", ")
    ep_returns = []
    ep_lens = 0.0
    videos = []
    info = {"vid": None, "episode_len": 0}

    for ep in range(num_episodes):
        ep_reward = 0.0
        rtg = {key: np.full(1, return_to_go / scale, dtype=np.float32) for key in image_keys}
        all_inputs: dict = {}
        done = False
        goal_image = None
        initial_state = None
        if eval_hdf5 is not None:
            goal_image, initial_state = load_goal_and_state(
                eval_data_path, eval_hdf5, eval_traj_idx, ep
            )

        obs = None
        next_obs = None
        for t in range(episode_length):
            if t == 0:
                if eval_data_path is not None:
                    env.reset()
                    obs = env.set_state(initial_state)
                    obs["goal"] = {"ob": goal_image}
                else:
                    obs = env.reset(env.config.rand_seed + ep)
            else:
                obs = next_obs

            if transform_obs_fn is not None:
                input_obs = copy.deepcopy(obs)
                for key, val in input_obs["image"].items():
                    input_obs["image"][key] = np.asarray(transform_obs_fn(val))
                if eval_data_path is not None and "goal" in input_obs:
                    for key, val in input_obs["goal"].items():
                        input_obs["goal"][key] = np.asarray(transform_obs_fn(val))
            else:
                input_obs = obs

            inputs = prepare_input(all_inputs, input_obs, rtg)
            action = np.asarray(jax.device_get(policy_fn(inputs=inputs, rngs=rng)))[0]
            action = transform_action_fn(action)
            all_inputs = update_input(all_inputs, input_obs, action, rtg)

            next_obs, reward, done, info = env.step(action)
            if eval_data_path is not None:
                next_obs["goal"] = {"ob": goal_image}

            ep_reward += float(reward)
            if reward_engine is not None:
                for key in obs["image"]:
                    r = compute_step_reward(
                        reward_engine, vl_type, obs["image"][key], text=text,
                        goal_image=goal_image, use_crop=use_crop,
                    )
                    if use_normalize:
                        rmin = reward_min[key] if isinstance(reward_min, dict) else reward_min
                        rtg[key] = rtg[key] - (r - rmin) / scale
                    else:
                        rtg[key] = rtg[key] - r / scale

            if done:
                # done-only accumulation is reference parity
                # (rollout_procgen.py:171): an episode that exhausts
                # episode_length without done contributes 0 here.
                # parallel_rollout instead substitutes the cap for timed-out
                # episodes; with the real Procgen engine both agree because
                # gym3 signals done at its internal timeout.
                ep_lens += info["episode_len"]
                break

        ep_returns.append(ep_reward)
        if info.get("vid") is not None:
            videos.append(info["vid"])

    if eval_hdf5 is not None:
        eval_hdf5.close()

    if num_episodes == 0:
        # degrade like a skipped eval — same contract as the parallel driver
        # (train/common.py parallel_test_step_fn's empty-wave fallback)
        nan = np.float32("nan")
        return {"return": nan, "episode_length": nan, "success_rate": nan}, info, videos

    metric = {
        "return": np.float32(sum(ep_returns) / num_episodes),
        "episode_length": np.float32(ep_lens / num_episodes),
        # success = any positive return (Procgen's sparse completion reward);
        # same definition as parallel_rollout and collect/eval_ppg.py
        "success_rate": np.float32(np.mean([r > 0 for r in ep_returns])),
    }
    return metric, info, videos


def parallel_rollout(
    rng,
    envs: list,
    policy_fn: Callable,
    transform_obs_fn: Optional[Callable] = None,
    episode_length: int = 500,
    window_size: int = 4,
    return_to_go: float = 100.0,
    scale: float = 100.0,
    reward_engine=None,
    vl_type: str = "clip",
    text=None,
    reward_min=0.0,
    use_normalize: bool = False,
    use_crop: bool = False,
    goal_images=None,
    initial_states=None,
    feed_goal_to_policy: bool = False,
    seed_offset: int = 0,
):
    """Lockstep rollout over N host envs with batched device inference.

    The policy and the reward model see (N, window, ...) batches every step —
    this is where the TPU redesign pays off (the reference does batch=1
    device round-trips per env step).  Finished episodes keep stepping a
    frozen no-op until all are done (standard padding semantics; their
    rewards stop accumulating).

    ``initial_states``: optional length-N list of env state blobs — each env
    resets then restores its state (goal-conditioned eval parity with
    batch_rollout's traj_state_{ep}.npy restore).
    ``feed_goal_to_policy``: window ``goal_images`` into the policy inputs
    under "goal"/"ob" (GCBC eval).
    """
    n = len(envs)
    image_keys = envs[0].config.image_key.split(", ")

    if initial_states is not None:
        assert len(initial_states) == n, (len(initial_states), n)
        obs = []
        for env, state in zip(envs, initial_states):
            env.reset()
            obs.append(env.set_state(state))
    else:
        obs = [env.reset(env.config.rand_seed + seed_offset + i) for i, env in enumerate(envs)]
    done = np.zeros(n, bool)
    total_reward = np.zeros(n, np.float64)
    ep_lens = np.zeros(n, np.int64)

    text_feat = None
    goal_feats = None
    if reward_engine is not None and vl_type in ("clip", "clip_ft"):
        text_feat = reward_engine.encode_text_features(text)
    elif reward_engine is not None and "goal_conditioned" in vl_type:
        assert goal_images is not None, "goal-conditioned rollout needs goal_images (N, H, W, C)"
        goals = np.asarray(goal_images)
        if use_crop:
            goals = _crop_half(goals)
        goal_feats = reward_engine.encode_image_features(goals, normalize=False)

    def transform(frames):
        if transform_obs_fn is None:
            return np.asarray(frames)
        return np.asarray(transform_obs_fn(np.asarray(frames)))

    # windows: dict key -> (N, W, ...) rolling buffers
    first = {key: transform(np.stack([o["image"][key] for o in obs])) for key in image_keys}
    img_window = {key: np.repeat(first[key][:, None], window_size, axis=1) for key in image_keys}
    act_window = np.zeros((n, window_size), np.int32)
    rtg_window = {
        key: np.full((n, window_size, 1), return_to_go / scale, np.float32) for key in image_keys
    }
    rtg_now = {key: np.full(n, return_to_go / scale, np.float32) for key in image_keys}
    valid_len = 1

    goal_input = None
    if feed_goal_to_policy:
        assert goal_images is not None, "feed_goal_to_policy needs goal_images"
        goal_input = transform(np.asarray(goal_images))  # (N, ...) constant per episode

    def roll_into(buf, new):
        buf[:, :-1] = buf[:, 1:]
        buf[:, -1] = new
        return buf

    for t in range(episode_length):
        w = min(valid_len, window_size)
        inputs = {
            "image": {k: img_window[k][:, -w:] for k in image_keys},
            "rtg": {k: rtg_window[k][:, -w:] for k in image_keys},
            "action": act_window[:, -w:],
            "instruct": None,
            "text_padding_mask": None,
        }
        if goal_input is not None:
            inputs["goal"] = {"ob": np.repeat(goal_input[:, None], w, axis=1)}
        actions = np.asarray(jax.device_get(policy_fn(inputs=inputs, rngs=rng)))
        # write the chosen action into the CURRENT frame's slot (it was a 0
        # placeholder during the policy call, exactly like batch_rollout's
        # prepare_input appends action=0 for the step being decided): slot k
        # must pair a_k with obs_k, the pairing training used
        act_window[:, -1] = actions.astype(np.int32)

        # rtg decrements use the PRE-step frame — the obs the policy just
        # acted on — matching batch_rollout and the reference
        # (rollout_procgen.py:134-150 scores `obs`, not `next_obs`); envs
        # already done before this step keep a frozen rtg
        if reward_engine is not None:
            for key in image_keys:
                frames = np.stack([np.asarray(o["image"][key]) for o in obs])
                if use_crop:
                    frames = _crop_half(frames)
                if vl_type in ("clip", "clip_ft"):
                    rewards = reward_engine.text_rewards_with_features(frames, text_feat)
                elif "goal_conditioned" in vl_type:
                    rewards = reward_engine.goal_rewards_with_features(frames, goal_feats)
                else:
                    raise ValueError(f"parallel_rollout: unsupported vl_type {vl_type}")
                if use_normalize:
                    rmin = reward_min[key] if isinstance(reward_min, dict) else reward_min
                    rewards = rewards - rmin
                rtg_now[key] = np.where(done, rtg_now[key], rtg_now[key] - rewards / scale)

        raw_frames = {key: [] for key in image_keys}
        step_rewards = np.zeros(n, np.float64)
        for i, env in enumerate(envs):
            if done[i]:
                for key in image_keys:
                    raw_frames[key].append(np.asarray(obs[i]["image"][key]))
                continue
            o, r, d, info = env.step(int(actions[i]))
            obs[i] = o
            step_rewards[i] = r
            if d:
                done[i] = True
                ep_lens[i] = info["episode_len"]
            for key in image_keys:
                raw_frames[key].append(np.asarray(o["image"][key]))
        total_reward += step_rewards

        # update windows with the new obs; its action slot starts as the 0
        # placeholder until the next policy call fills it
        for key in image_keys:
            roll_into(img_window[key], transform(np.stack(raw_frames[key])))
            roll_into(rtg_window[key], rtg_now[key][:, None])
        roll_into(act_window, np.zeros(n, np.int32))
        valid_len += 1

        if done.all():
            break

    ep_lens = np.where(ep_lens == 0, episode_length, ep_lens)
    metric = {
        "return": np.float32(total_reward.mean()),
        "episode_length": np.float32(ep_lens.mean()),
        "success_rate": np.float32((total_reward > 0).mean()),
    }
    return metric
