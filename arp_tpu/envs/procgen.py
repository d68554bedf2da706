"""Procgen environment wrapper (real C++ engine via gym, when installed).

Same interface and level-split semantics as the reference wrapper
(arp_dt/envs/procgen.py): eval runs on *unseen* levels by shifting
start_level += num_levels and doubling num_levels unless use_train_levels;
a fresh env is created per reset with the given seed; frames are recorded
for every `record_every`-th episode.

The procgen pip forks (procgen / procgenAISC / procgen_highres*) are not
available in every environment — construction raises a clear error then;
use arp_tpu.envs.FakeProcgen for engine-free testing.
"""

from __future__ import annotations

from typing import Union

import numpy as np
from ml_collections import ConfigDict

from ..config import update_config


class Procgen:
    @staticmethod
    def get_default_config(updates=None):
        config = ConfigDict()
        config.image_key = "ob"
        config.state_key = ""
        config.episode_length = 1000
        config.record_video = True
        config.record_every = 50
        config.distribution_mode = "hard"
        config.num_levels = 500
        config.start_level = 0
        config.eval_start_level = 500
        config.rand_seed = 42
        config.eval_env_type = "none"
        config.use_train_levels = False
        return update_config(config, updates)

    def __init__(self, game_name: str, update, image_resolution: str = "high"):
        self.config = self.get_default_config(update)
        self._episode_index = 0
        self._record_current_episode = True
        self._recorded_images: list = []
        self._i = 0
        self._image_resolution = image_resolution
        self.game_name = game_name
        self._create_env()

    def _gym(self):
        try:
            import gym
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "The procgen C++ engine (gym + procgen forks) is not installed. "
                "Install procgen/procgenAISC/procgen_highres, or use "
                "arp_tpu.envs.FakeProcgen for engine-free rollouts."
            ) from e
        return gym

    def _create_env(self, rand_seed: int = 42):
        gym = self._gym()
        # eval on unseen levels: shift start past the train block, double range
        if self.config.use_train_levels:
            num_levels = self.config.num_levels
            start_level = self.config.start_level
        else:
            num_levels = self.config.num_levels * 2
            start_level = self.config.start_level + self.config.num_levels

        kwargs = dict(
            distribution_mode=self.config.distribution_mode,
            num_levels=num_levels,
            start_level=start_level,
            rand_seed=rand_seed,
        )
        if self.config.eval_env_type == "none":
            env_id = (
                f"procgen-highres-{self.game_name}-v0"
                if self._image_resolution == "high"
                else f"procgen-{self.game_name}-v0"
            )
        else:
            env_id = (
                f"procgen-highres-aisc-{self.game_name}_{self.config.eval_env_type}-v0"
                if self._image_resolution == "high"
                else f"procgen-aisc-{self.game_name}-v0"
            )
        self._env = gym.make(id=env_id, **kwargs)

    @property
    def observation_space(self):
        return self._env.observation_space

    @property
    def action_space(self):
        return self._env.action_space

    def reset(self, rand_seed: int = 42):
        self._create_env(rand_seed=rand_seed)
        obs = self._env.reset()
        self._prev_obs = obs
        res = self.get_image_state(obs)
        self._i = 0
        self._episode_index += 1
        self._record_current_episode = (
            self.config.record_video and self._episode_index % self.config.record_every == 0
        )
        self._recorded_images.clear()
        self.record(obs)
        return res

    def record(self, obs):
        self._recorded_images.append(obs)

    def step(self, action: Union[int, np.ndarray]):
        obs, reward, terminal, _ = self._env.step(action)
        self.record(obs)
        self._prev_obs = obs
        res = self.get_image_state(obs)
        self._i += 1

        if terminal or self._i == self.config.episode_length:
            done = True
            vid = np.array(self._recorded_images) if self._record_current_episode else None
        else:
            done = False
            vid = None
        info = {"vid": vid, "episode_len": self._i, "terminal": terminal}
        return res, reward, done, info

    def get_image_state(self, obs):
        res = {"image": {}}
        for k in self.config.image_key.split(", "):
            res["image"][k] = obs
        if self.config.state_key != "":
            res["state"] = np.concatenate([obs[k] for k in self.config.state_key.split(", ")])
        return res

    # engine save-state access (gym3 wrappers expose get_state/set_state)
    def _inner_env(self):
        env = self._env
        for _ in range(8):
            if hasattr(env, "set_state"):
                return env
            env = getattr(env, "env", env)
        return env

    def get_state(self):
        return self._inner_env().get_state()

    def set_state(self, state):
        inner = self._inner_env()
        inner.set_state(state)
        rgb = inner.observe()[1]["rgb"][0]
        self._recorded_images.append(rgb)
        return self.get_image_state(rgb)
