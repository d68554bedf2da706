"""Evaluate a trained PPG policy (parity with data/PPG/eval.py)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from .ppg import PhasicValueModel


def evaluate(params, envs, num_episodes: int = 10, greedy: bool = True, seed: int = 0):
    model = PhasicValueModel(num_actions=15)

    @jax.jit
    def act(params, frames, rng):
        logits, _, _ = model.apply({"params": params}, frames)
        greedy_a = logits.argmax(-1)
        sampled = jax.random.categorical(rng, logits)
        return jnp.where(greedy, greedy_a, sampled)

    key = envs[0].config.image_key.split(", ")[0]
    returns = []
    rng = jax.random.PRNGKey(seed)
    ep = 0
    obs = [e.reset(seed + i) for i, e in enumerate(envs)]
    running = np.zeros(len(envs))
    while ep < num_episodes:
        frames = np.stack([np.asarray(o["image"][key], np.float32) / 255.0 for o in obs])
        rng, akey = jax.random.split(rng)
        actions = np.asarray(act(params, jnp.asarray(frames), akey))
        for i, env in enumerate(envs):
            o, r, d, info = env.step(int(actions[i]))
            running[i] += r
            if d:
                returns.append(running[i])
                running[i] = 0.0
                ep += 1
                o = env.reset(seed + 1000 + ep)
            obs[i] = o
    return {
        "mean_return": float(np.mean(returns)),
        "num_episodes": len(returns),
        "success_rate": float(np.mean(np.asarray(returns) > 0)),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--game_name", default="coinrun")
    p.add_argument("--num_episodes", type=int, default=10)
    p.add_argument("--num_envs", type=int, default=4)
    p.add_argument("--fake_env", action="store_true")
    args = p.parse_args()

    from ..checkpoint import load_pickle

    params = load_pickle(args.checkpoint)
    # train_ppg saves {"params": ..., "history": ...}; also accept TrainState
    # pickles and raw param trees
    if isinstance(params, dict) and "params" in params:
        params = params["params"]
    elif hasattr(params, "params"):
        params = params.params

    if args.fake_env:
        from ..envs.fake import FakeProcgen

        envs = [FakeProcgen(args.game_name, {}) for _ in range(args.num_envs)]
    else:
        from ..envs.procgen import Procgen

        envs = [Procgen(args.game_name, {}, image_resolution="low") for _ in range(args.num_envs)]
    print(evaluate(params, envs, num_episodes=args.num_episodes))


if __name__ == "__main__":
    main()
