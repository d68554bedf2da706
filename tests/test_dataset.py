"""ProcgenDataset + DataLoader semantics vs the reference implementation."""

from collections import deque

import h5py
import numpy as np
import pytest

from arp_tpu.data.loader import DataLoader
from arp_tpu.data.procgen_dataset import ProcgenDataset, build_instruction_tokenizer, dataset_dirname

NAME = "coinrun_hard_level0to500_num10_frame8"


def make_file(root, split="train", n=24, num_frames=8, img=8, reward_base=100.0):
    ddir = root / NAME
    ddir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0 if split == "train" else 1)
    rewards = (rng.normal(size=n) * 5 + reward_base).astype(np.float32)
    with h5py.File(ddir / f"data_{split}.hdf5", "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, num_frames, img, img, 3), dtype=np.uint8))
        g.create_dataset("act", data=rng.integers(0, 15, size=(n, num_frames)).astype(np.int64))
        done = np.zeros((n, num_frames), bool)
        done[n // 2 - 1, -1] = True
        done[n - 1, -1] = True
        g.create_dataset("done", data=done)
        # frame-stacked reward rows, as the labeler writes them
        rows = np.zeros((n, num_frames), np.float32)
        stack = deque([], maxlen=num_frames)
        for traj in ((0, n // 2), (n // 2, n)):
            stack = deque([], maxlen=num_frames)
            for i in range(traj[0], traj[1]):
                if i == traj[0]:
                    stack.extend([rewards[i]] * num_frames)
                else:
                    stack.append(rewards[i])
                rows[i] = list(stack)
        g.create_dataset("ob_clip_reward", data=rows)
    return rewards


def reference_rtgs(rewards, traj_bounds, num_frames):
    """The reference's deque-based rtg preprocessing (data_procgen.py:132-165)."""
    out = []
    for lo, hi in traj_bounds:
        r = rewards[lo:hi]
        cum = np.cumsum(r[::-1])[::-1]
        stack = deque([], maxlen=num_frames)
        for i in range(len(r)):
            if i == 0:
                stack.extend([cum[i]] * num_frames)
            else:
                stack.append(cum[i])
            out.append(list(stack))
    return np.asarray(out, np.float32)


def test_rtg_preprocessing_matches_reference(tmp_path):
    rewards = make_file(tmp_path)
    n = 24
    cfg = {
        "path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4,
        "use_vl": True, "vl_type": "clip",
    }
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    expected = reference_rtgs(rewards, [(0, n // 2), (n // 2, n)], 8)
    np.testing.assert_allclose(ds.rtgs["ob"], expected, rtol=1e-5)
    # coinrun: return_to_go = max // 100 * 100
    assert ds.return_to_go == float(np.max(expected) // 100 * 100)
    assert ds.scale > 0

    item = ds[3]
    assert item["image"]["ob"].shape == (4, 8, 8, 3)
    np.testing.assert_allclose(
        item["rtg"]["ob"][:, 0], expected[3, -4:] / ds.scale, rtol=1e-5
    )
    assert item["action"].shape == (4,)
    # hindsight goal comes from the same trajectory's future
    assert item["goal"]["ob"].shape == (4, 8, 8, 3)


def test_use_normalize_shifts_rewards(tmp_path):
    make_file(tmp_path)
    cfg = {
        "path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4,
        "use_vl": True, "use_normalize": True,
    }
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    assert ds.reward_min["ob"] <= ds.reward_max["ob"]
    # normalized rewards are nonneg => rtgs nonneg
    assert (ds.rtgs["ob"] >= -1e-5).all()


def test_per_host_offset(tmp_path):
    make_file(tmp_path)
    cfg = {"path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4}
    ds0 = ProcgenDataset(cfg, dataset_name=NAME, split="train", start_offset_ratio=0.0)
    ds1 = ProcgenDataset(cfg, dataset_name=NAME, split="train", start_offset_ratio=0.5)
    assert ds1.random_start_offset == len(ds1) // 2
    assert ds1.process_index(0) == len(ds1) // 2
    # the offset must reach the DATA path: ds1[0] serves the item ds0 serves
    # at index len//2 (not merely store an unused attribute)
    np.testing.assert_array_equal(
        np.asarray(ds1[0]["action"]), np.asarray(ds0[len(ds0) // 2]["action"])
    )
    np.testing.assert_array_equal(
        np.asarray(ds1[0]["image"]["ob"]), np.asarray(ds0[len(ds0) // 2]["image"]["ob"])
    )


def test_loader_epochs_and_shapes(tmp_path):
    make_file(tmp_path)
    cfg = {
        "path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4,
        "use_vl": True,
    }
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    loader = DataLoader(ds, batch_size=8, num_workers=2, seed=0)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["image"]["ob"].shape == (8, 4, 8, 8, 3)
    assert b["rtg"]["ob"].shape == (8, 4, 1)
    assert b["action"].shape == (8, 4)
    # different epochs shuffle differently
    e1 = next(iter(loader))
    assert not np.array_equal(batches[0]["action"], e1["action"])


def test_dataset_dirname():
    assert (
        dataset_dirname("coinrun", "hard", 0, 500, 500, 8)
        == "coinrun_hard_level0to500_num500_frame8"
    )
    assert dataset_dirname("maze", "hard", 0, 500, 500, 8, enable_filter=False, env_type="aisc").endswith(
        "_unfiltered_aisc"
    )


def test_instruction_tokenizer_fallback():
    tok = build_instruction_tokenizer(use_bert=True, max_length=16)
    ids, pad = tok("collect the coin.")
    assert ids.shape == (16,) and pad.shape == (16,)
    assert pad[0] == 0.0 and pad[-1] == 1.0
    ids2, _ = tok("collect the coin.")
    np.testing.assert_array_equal(ids, ids2)  # deterministic
    empty_ids, empty_pad = tok("")
    assert (empty_pad == 1.0).all()

    clip_tok = build_instruction_tokenizer(use_bert=False, max_length=77)
    ids, pad = clip_tok("collect the coin.")
    assert ids.shape == (77,)


def test_dataset_arps_backend(tmp_path):
    """ARPS-backed image reads return the same data as h5py."""
    make_file(tmp_path)
    cfg = {"path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4}
    ds_h5 = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    ds_arps = ProcgenDataset({**cfg, "use_arps": True}, dataset_name=NAME, split="train")
    np.random.seed(0)
    a = ds_h5[5]
    np.random.seed(0)
    b = ds_arps[5]
    np.testing.assert_array_equal(a["image"]["ob"], b["image"]["ob"])
    np.testing.assert_array_equal(a["goal"]["ob"], b["goal"]["ob"])


def test_loader_skip_batches_resume(tmp_path):
    """epochs(skip_batches=k) yields exactly the batches a fresh run would
    produce after k steps — exact dataloader resume."""
    make_file(tmp_path)
    cfg = {"path": str(tmp_path), "image_size": 8, "num_frames": 8, "window_size": 4}
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")

    fresh = DataLoader(ds, batch_size=8, num_workers=0, seed=7)
    stream = fresh.epochs()
    reference_batches = [next(stream)["action"] for _ in range(7)]

    resumed_loader = DataLoader(ds, batch_size=8, num_workers=0, seed=7)
    resumed = resumed_loader.epochs(skip_batches=4)
    for k in range(4, 7):
        np.testing.assert_array_equal(next(resumed)["action"], reference_batches[k])


def test_num_subset_with_offset_constructs(tmp_path):
    """Regression (r3 review): num_subset != -1 made __len__ read
    h5_file_traj_idx before __init__ assigned it when an offset/random_start
    was requested -> AttributeError at construction."""
    make_file(tmp_path)
    cfg = {"path": str(tmp_path), "image_size": 8, "num_frames": 8,
           "window_size": 4, "num_subset": 2}
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train", start_offset_ratio=0.5)
    assert len(ds) == ds.h5_file_traj_idx[2]
    assert ds.random_start_offset == len(ds) // 2
    _ = ds[0]  # item fetch works

    cfg2 = dict(cfg, random_start=True)
    ds2 = ProcgenDataset(cfg2, dataset_name=NAME, split="train")
    assert 0 <= ds2.random_start_offset < len(ds2)


def test_task_reward_mode_needs_no_vl_labels(tmp_path):
    """Regression (r3 review): use_task_reward reads h5['rtg'] directly —
    it must not require VL-labeled rewards nor let a VL-derived scale
    overwrite config.scale."""
    import h5py

    make_file(tmp_path)
    path = str(tmp_path / NAME / "data_train.hdf5")
    with h5py.File(path, "a") as g:
        n, f = g["ob"].shape[:2]
        g.create_dataset("rtg", data=np.linspace(10, 0, n * f).reshape(n, f).astype(np.float32))
        # NO ob_clip_reward datasets exist: preprocess_rtgs would raise
    cfg = {"path": str(tmp_path), "image_size": 8, "num_frames": 8,
           "window_size": 4, "use_vl": True, "use_task_reward": True, "scale": 10.0}
    ds = ProcgenDataset(cfg, dataset_name=NAME, split="train")
    item = ds[0]
    assert item["rtg"]["ob"].shape == (4, 1)
    assert ds.config.scale == 10.0  # not overwritten by a VL-derived scale
