"""Dataset post-processing: fuse two env-type demo files at a ratio.

Parity with data/PPG/fuse_data.py: take `ratio` of trajectories from file A
and `1-ratio` from file B into a new HDF5 with the same schema.
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def _traj_slices(g):
    idx = list(np.nonzero(g["done"][:, -1])[0] + 1)
    idx.insert(0, 0)
    return [(idx[i], idx[i + 1]) for i in range(len(idx) - 1)]


def fuse(path_a: str, path_b: str, out_path: str, ratio: float = 0.5, seed: int = 0):
    rng = np.random.default_rng(seed)
    with h5py.File(path_a, "r") as ga, h5py.File(path_b, "r") as gb, h5py.File(out_path, "w") as go:
        slices_a = _traj_slices(ga)
        slices_b = _traj_slices(gb)
        n_a = int(round(len(slices_a) * ratio))
        n_b = int(round(len(slices_b) * (1.0 - ratio)))
        picked = [(ga, s) for s in rng.permutation(len(slices_a))[:n_a].tolist()] + [
            (gb, s) for s in rng.permutation(len(slices_b))[:n_b].tolist()
        ]
        keys = [k for k in ga.keys() if k in gb]
        out = {k: [] for k in keys}
        for g, si in picked:
            sl = _traj_slices(g)[si]
            for k in keys:
                out[k].append(g[k][sl[0] : sl[1]])
        for k in keys:
            data = np.concatenate(out[k], axis=0)
            go.create_dataset(k, data=data, compression="gzip", chunks=(1,) + data.shape[1:])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--path_a", required=True)
    p.add_argument("--path_b", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    fuse(args.path_a, args.path_b, args.out, args.ratio, args.seed)


if __name__ == "__main__":
    main()
