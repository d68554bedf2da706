"""Re-render demonstrations at low resolution by replaying engine states.

Parity with data/PPG/downsize_demonstrations.py: walks a demo directory's
``traj_state_{i}.npy`` files, restores each state into a low-resolution env,
and writes a new HDF5 with 64x64 observations aligned to the original steps.

Requires an env exposing set_state (the real Procgen engine, or FakeProcgen
for tests).  A pure-resize fallback (--mode resize) downsizes the recorded
high-res frames directly when engine replay is unavailable.
"""

from __future__ import annotations

import argparse
import os

import h5py
import numpy as np

from ..collect.recorder import stack_episode_frames
from ..ops.preprocess import resize_bicubic_pil


def downsize_by_resize(data_path: str, out_path: str, out_size: int = 64, image_key: str = "ob"):
    """Downsize recorded frames with the bit-exact PIL-equivalent resize."""
    import jax

    with h5py.File(data_path, "r") as g, h5py.File(out_path, "w") as out:
        for key in g.keys():
            if key != image_key:
                out.create_dataset(key, data=g[key][...], compression="gzip")
                continue
            ob = g[key]  # (T, F, H, W, C)
            T, F = ob.shape[:2]
            ds = out.create_dataset(
                key,
                shape=(T, F, out_size, out_size, ob.shape[-1]),
                dtype=np.uint8,
                compression="gzip",
                chunks=(1, F, out_size, out_size, ob.shape[-1]),
            )
            resize = jax.jit(lambda x: resize_bicubic_pil(x, out_size, out_size))
            for t in range(0, T, 64):
                block = ob[t : t + 64]
                flat = block.reshape((-1,) + block.shape[2:])
                small = np.asarray(resize(flat))
                ds[t : t + 64] = small.reshape(block.shape[:2] + small.shape[1:])


def downsize_by_replay(demo_dir: str, out_path: str, env, image_key: str = "ob", num_frames: int = 8):
    """Replay saved engine states in a low-res env and record its frames."""
    episodes = sorted(
        (f for f in os.listdir(demo_dir) if f.startswith("traj_state_") and f.endswith(".npy")),
        # numeric episode order — lexicographic would put traj_state_10 before
        # traj_state_2 and misalign replayed frames with the original rows
        key=lambda f: int(f[len("traj_state_"):-len(".npy")]),
    )
    with h5py.File(out_path, "w") as out:
        ds = None
        for ep_file in episodes:
            states = np.load(os.path.join(demo_dir, ep_file), allow_pickle=True)
            frames = []
            env.reset()
            for state in states:
                obs = env.set_state(state)
                frames.append(np.asarray(obs["image"][image_key]))
            stacked = stack_episode_frames(np.stack(frames), num_frames)
            if ds is None:
                ds = out.create_dataset(
                    image_key,
                    data=stacked,
                    compression="gzip",
                    maxshape=(None,) + stacked.shape[1:],
                    chunks=(1,) + stacked.shape[1:],
                )
            else:
                ds.resize(ds.shape[0] + stacked.shape[0], axis=0)
                ds[-stacked.shape[0] :] = stacked


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--out_path", required=True)
    p.add_argument("--out_size", type=int, default=64)
    p.add_argument("--mode", choices=["resize", "replay"], default="resize")
    p.add_argument("--game_name", default="coinrun")
    args = p.parse_args()
    if args.mode == "resize":
        downsize_by_resize(args.data_path, args.out_path, args.out_size)
    else:
        from ..envs.procgen import Procgen

        env = Procgen(args.game_name, {}, image_resolution="low")
        downsize_by_replay(os.path.dirname(args.data_path), args.out_path, env)


if __name__ == "__main__":
    main()
