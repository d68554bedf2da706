"""Vectorized fake-engine stepping throughput: Python stub vs native C++.

The env hot loop (act + observe/render) is host-side work that bounds PPG
collection and lockstep eval waves; the native engine (native/gridenv.cpp)
moves it to C++ with threaded batch rendering. Pure host bench — no device.

Usage: PYTHONPATH=/root/repo python scripts/bench_native_env.py [--num 64]
"""

import argparse
import json
import time

import numpy as np

from arp_tpu.envs.gym3_stub import FakeProcgenGym3
from arp_tpu.envs.native_engine import NativeProcgenGym3, native_lib


def run(cls, num: int, resolution: int, steps: int, seed: int = 0) -> float:
    env = cls(game_name="coinrun", num=num, resolution=resolution, grid=8,
              episode_length=500, num_levels=200, rand_seed=7)
    rng = np.random.default_rng(seed)
    actions = rng.integers(0, 4, size=(steps, num)).astype(np.int32)
    env.observe()  # warm
    t0 = time.perf_counter()
    for t in range(steps):
        env.act(actions[t])
        env.observe()
    dt = time.perf_counter() - t0
    return steps * num / dt  # env-frames per second


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    assert native_lib() is not None, "libgridenv.so unavailable"
    for res in (args.resolution, 256):
        best = {}
        # interleave passes: host load variance exceeds the engine effect otherwise
        for _ in range(args.passes):
            for name, cls in (("python", FakeProcgenGym3), ("native", NativeProcgenGym3)):
                fps = run(cls, args.num, res, args.steps)
                best[name] = max(best.get(name, 0.0), fps)
        print(json.dumps({
            "num": args.num, "resolution": res, "steps": args.steps,
            "python_fps": round(best["python"], 1),
            "native_fps": round(best["native"], 1),
            "speedup": round(best["native"] / best["python"], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
