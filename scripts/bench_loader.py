"""Host input-pipeline throughput: ProcgenDataset + DataLoader, no device.

The train step consumes ~850 frames/s on one v5e chip (docs/BENCHMARKS.md);
this measures whether the HDF5 window reader + thread-pool collate on THIS
host can feed that (and how it scales with workers).  Run it on a real TPU
host before production training — if loader fps < step fps, raise
--dataloader_n_workers or pre-cache embeddings.

Measured on the 2-core dev host (idle): 0.8-1.6k frames/s at 256px across
0/2/4 workers — the same order as the step's consumption, i.e. little margin
on 2 cores, no bottleneck expected on a real multi-core TPU host.  Run-to-run
variance under ANY background load is larger than the worker-count effect
here; interleave repeats (--workers 2 4 2 4) before believing a difference.

Usage: python scripts/bench_loader.py [--rows 512] [--img 256] [--workers 0 2 4]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_file(root, rows, img, num_frames):
    import h5py

    ddir = os.path.join(root, f"coinrun_hard_level0to500_num{rows}_frame{num_frames}")
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(0)
    for split, count in (("train", rows), ("val", 8)):
        with h5py.File(os.path.join(ddir, f"data_{split}.hdf5"), "w") as g:
            g.create_dataset(
                "ob",
                data=rng.integers(0, 256, (count, num_frames, img, img, 3), np.uint8),
            )
            g.create_dataset("act", data=rng.integers(0, 15, (count, num_frames)).astype(np.int64))
            done = np.zeros((count, num_frames), bool)
            done[count // 2 - 1, -1] = done[count - 1, -1] = True
            g.create_dataset("done", data=done)
            r = rng.normal(size=(count, num_frames)).astype(np.float32)
            g.create_dataset("ob_clip_reward", data=r)
            g.create_dataset("ob_clip_pos_rtg", data=r)
    return ddir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=512)
    ap.add_argument("--img", type=int, default=256)
    ap.add_argument("--num_frames", type=int, default=8)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--batches", type=int, default=24, help="measured batches per pass")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2, 4])
    ap.add_argument("--root", default=None, help="reuse an existing dataset root")
    args = ap.parse_args()

    from arp_tpu.data.loader import DataLoader
    from arp_tpu.data.procgen_dataset import ProcgenDataset

    root = args.root or tempfile.mkdtemp(prefix="bench_loader_")
    if args.root is None:
        t0 = time.time()
        make_file(root, args.rows, args.img, args.num_frames)
        print(f"dataset written in {time.time()-t0:.1f}s under {root}")

    name = f"coinrun_hard_level0to500_num{args.rows}_frame{args.num_frames}"
    ds = ProcgenDataset(
        dict(
            path=root,
            image_size=args.img,
            num_frames=args.num_frames,
            window_size=args.window,
            num_demonstrations=args.rows,
            use_vl=True,
        ),
        dataset_name=name,
    )
    for w in args.workers:
        loader = DataLoader(ds, batch_size=args.batch, num_workers=w, seed=0)
        it = iter(loader.epochs())
        next(it)  # warm (file cache, pools)
        t0 = time.time()
        n = 0
        for _ in range(args.batches):
            b = next(it)
            n += b["action"].shape[0] * b["action"].shape[1]
        dt = time.time() - t0
        print(
            f"workers={w}: {n/dt:.0f} frames/s "
            f"({args.batches/dt:.1f} batches/s at batch={args.batch} window={args.window}, "
            f"{n*args.img*args.img*3/dt/1e6:.0f} MB/s of pixels)"
        )


if __name__ == "__main__":
    main()
