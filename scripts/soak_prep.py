"""Build the synthetic labeled dataset for the real-hardware soak run.

Same schema the labeler writes (tests/test_trainer_e2e.py::make_labeled_dataset,
scaled up): bigger frames + more rows so the trainer does real device work.

Usage: python scripts/soak_prep.py <root> [--rows 128] [--img 128]
"""

import argparse
import os

import h5py
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--rows", type=int, default=128)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--num_frames", type=int, default=8)
    args = ap.parse_args()

    # dirname must match dataset_dirname() for the trainer flags the soak uses
    # (num_demonstrations == rows)
    ddir = os.path.join(
        args.root, f"coinrun_hard_level0to500_num{args.rows}_frame{args.num_frames}"
    )
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, count in (("train", args.rows), ("val", max(args.rows // 8, 8))):
        path = os.path.join(ddir, f"data_{split}.hdf5")
        with h5py.File(path, "w") as g:
            g.create_dataset(
                "ob",
                data=rng.integers(
                    0, 256, size=(count, args.num_frames, args.img, args.img, 3), dtype=np.uint8
                ),
            )
            g.create_dataset(
                "act", data=rng.integers(0, 15, size=(count, args.num_frames)).astype(np.int64)
            )
            done = np.zeros((count, args.num_frames), bool)
            for end in range(count // 8, count + 1, max(count // 4, 1)):
                done[min(end, count) - 1, -1] = True
            done[count - 1, -1] = True
            g.create_dataset("done", data=done)
            rewards = rng.normal(size=(count,)).astype(np.float32) * 10 + 200
            rows = np.repeat(rewards[:, None], args.num_frames, axis=1)
            g.create_dataset("ob_clip_reward", data=rows)
            g.create_dataset("ob_clip_pos_rtg", data=rows)
        print(f"wrote {path}")
    print(ddir)


if __name__ == "__main__":
    main()
