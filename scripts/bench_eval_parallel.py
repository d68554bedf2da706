"""Eval wall-time: sequential batch_rollout vs batched parallel_rollout.

VERDICT r2 item 4 evidence: both paths run the SAME tiny BC policy
(vit_debug transformer, jitted greedy_action) over FakeProcgen; the parallel
path amortizes the per-step device round-trip over N lockstep envs.  Runs on
any backend (CPU by default — the effect measured here is dispatch/round-trip
amortization, which only grows on the tunnel-attached TPU).

Usage: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/bench_eval_parallel.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.envs.fake import FakeProcgen
from arp_tpu.envs.rollout import batch_rollout, parallel_rollout
from arp_tpu.models.policy import BC

EPISODES = 8
EP_LEN = 40
WINDOW = 4
IMG = 32


def main():
    cfg = dict(model_type="vit_debug", transfer_type="none", emb_dim=32, depth=2,
               num_heads=4, mlp_ratio=2, use_discrete_action=True, num_ensembles=2)
    model = BC(config_updates=cfg, num_actions=15, patch_dim=16)
    rng = np.random.default_rng(0)
    batch = {
        "image": {"ob": jnp.asarray(rng.normal(size=(1, WINDOW, IMG, IMG, 3)).astype(np.float32))},
        "action": jnp.zeros((1, WINDOW), jnp.int32),
        "rtg": {"ob": jnp.zeros((1, WINDOW, 1), jnp.float32)},
        "instruct": None, "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, batch, deterministic=True)["params"]

    @jax.jit
    def policy_jit(params, inputs):
        return model.apply({"params": params}, inputs, method=model.greedy_action)

    def policy(inputs, rngs):
        merged = dict(inputs)
        merged.setdefault("instruct", None)
        merged.setdefault("text_padding_mask", None)
        return policy_jit(params, merged)

    def transform(x):
        return np.asarray(x, np.float32) / 255.0

    env_conf = {"episode_length": EP_LEN, "image_size": IMG, "grid": 6}

    # warm both jit caches (all window lengths) with a throwaway run each
    for warm in range(2):
        t0 = time.time()
        env = FakeProcgen("coinrun", dict(env_conf))
        batch_rollout(
            rng=jax.random.PRNGKey(0), data_aug_rng=jax.random.PRNGKey(1), env=env,
            policy_fn=policy, transform_obs_fn=transform, episode_length=EP_LEN,
            window_size=WINDOW, num_episodes=EPISODES if warm else 1,
            return_to_go=10.0, scale=10.0,
        )
        seq_s = time.time() - t0

    for warm in range(2):
        t0 = time.time()
        envs = [FakeProcgen("coinrun", dict(env_conf)) for _ in range(EPISODES)]
        parallel_rollout(
            rng=jax.random.PRNGKey(0), envs=envs, policy_fn=policy,
            transform_obs_fn=transform, episode_length=EP_LEN, window_size=WINDOW,
            return_to_go=10.0, scale=10.0,
        )
        par_s = time.time() - t0

    print(json.dumps({
        "episodes": EPISODES, "episode_length": EP_LEN,
        "batch_rollout_s": round(seq_s, 2),
        "parallel_rollout_s": round(par_s, 2),
        "speedup": round(seq_s / par_s, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
