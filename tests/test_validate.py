"""Demo-file validator vs the REAL producer (collect/recorder.py): a file
the recorder writes must validate clean, and each corruption class the
validator exists to catch must be flagged."""

import h5py
import numpy as np
import pytest

from arp_tpu.collect.recorder import TrajectoryRecorder
from arp_tpu.data.validate import validate_file


@pytest.fixture()
def demo_file(tmp_path):
    path = str(tmp_path / "data_train.hdf5")
    rec = TrajectoryRecorder(path, game_name="coinrun", num_frames=4,
                             max_episode_length=100, save_states=False)
    rng = np.random.default_rng(0)

    def obs():
        return {"image": {"ob": rng.integers(0, 256, (16, 16, 3), np.uint8)}}

    for ep in range(3):
        T = 6 + ep
        rec.begin_episode(obs())
        for t in range(T):
            rec.record_step(
                obs=obs(),
                action=int(rng.integers(0, 15)),
                reward=float(t == T - 1) * 10.0,
                done=t == T - 1,
            )
        assert rec.end_episode(success_filter=False)
    return path


def test_recorder_output_validates_clean(demo_file):
    rep = validate_file(demo_file)
    assert rep.errors == []
    # unlabeled file: only the no-reward-labels situation may warn
    assert all("reward" in w or "rtg" in w for w in rep.warnings)


def test_validator_flags_corruptions(demo_file):
    # truncated write: last row no longer ends a trajectory
    with h5py.File(demo_file, "a") as g:
        g["done"][-1, -1] = False
    rep = validate_file(demo_file)
    assert any("boundary" in e for e in rep.errors)
    with h5py.File(demo_file, "a") as g:
        g["done"][-1, -1] = True

    # broken frame stacking (a consumer-visible data corruption)
    with h5py.File(demo_file, "a") as g:
        g["ob"][2, 0] = 255 - g["ob"][2, 0]
    rep = validate_file(demo_file)
    assert any("shift" in e for e in rep.errors)


def test_validator_checks_labeled_rtg(demo_file, tmp_path):
    from arp_tpu.reward.labeler import get_traj_boundaries
    from arp_tpu.ops.rewards import discount_cumsum, stack_frames

    with h5py.File(demo_file, "a") as g:
        n, f = g["ob"].shape[:2]
        traj_idx, _, _ = get_traj_boundaries(g)
        r = np.random.default_rng(1).normal(size=n).astype(np.float32)
        rtg = np.zeros(n, np.float32)
        for a, b in zip(traj_idx[:-1], traj_idx[1:]):
            rtg[a:b] = discount_cumsum(r[a:b], 1.0)
        g.create_dataset("ob_clip_reward", data=stack_frames(r, f))
        g.create_dataset("ob_clip_pos_rtg", data=stack_frames(rtg, f))
    assert validate_file(demo_file).errors == []

    # poison the rtg: the gamma=1 consistency warning must fire
    with h5py.File(demo_file, "a") as g:
        g["ob_clip_pos_rtg"][0, -1] += 5.0
    rep = validate_file(demo_file)
    assert any("suffix-cumsum" in w for w in rep.warnings)

    # non-finite reward is an error
    with h5py.File(demo_file, "a") as g:
        g["ob_clip_reward"][0, -1] = np.nan
    assert any("non-finite" in e for e in validate_file(demo_file).errors)


def test_validator_handles_rank_deficient_and_missing(tmp_path, demo_file):
    # missing file: reported, not raised
    rep = validate_file(str(tmp_path / "nope.hdf5"))
    assert any("cannot open" in e for e in rep.errors)
    # rank-deficient ob: reported, not a traceback
    bad = str(tmp_path / "bad.hdf5")
    with h5py.File(bad, "w") as g:
        g.create_dataset("ob", data=np.zeros(7, np.uint8))
        g.create_dataset("act", data=np.zeros(7, np.int64))
        g.create_dataset("done", data=np.zeros(7, bool))
    rep = validate_file(bad)
    assert any("expected (N, F, H, W, 3)" in e for e in rep.errors)


def test_validator_matches_pipeline_label_variants(demo_file):
    """inst_type-suffixed labels (labeler) and the reference's _pos_reward
    variant (dataset reader) must BOTH be validated and pair with the right
    rtg key — review finding: they were silently skipped / mis-derived."""
    from arp_tpu.reward.labeler import get_traj_boundaries
    from arp_tpu.ops.rewards import discount_cumsum, stack_frames

    with h5py.File(demo_file, "a") as g:
        n, f = g["ob"].shape[:2]
        traj_idx, _, _ = get_traj_boundaries(g)
        r = np.random.default_rng(2).normal(size=n).astype(np.float32)
        rtg = np.zeros(n, np.float32)
        for a, b in zip(traj_idx[:-1], traj_idx[1:]):
            rtg[a:b] = discount_cumsum(r[a:b], 1.0)
        # inst-suffixed pair (labeler --inst_type misinfo)
        g.create_dataset("ob_clip_reward_misinfo", data=stack_frames(r, f))
        g.create_dataset("ob_clip_pos_rtg_misinfo", data=stack_frames(rtg, f))
        # reference _pos_reward variant pairs with _pos_rtg
        g.create_dataset("ob_clip_pos_reward", data=stack_frames(r, f))
        g.create_dataset("ob_clip_pos_rtg", data=stack_frames(rtg, f))
    rep = validate_file(demo_file)
    assert rep.errors == []
    assert not any("present without" in w for w in rep.warnings)
    # corrupt the inst-suffixed reward: it must now be VALIDATED (error)
    with h5py.File(demo_file, "a") as g:
        g["ob_clip_reward_misinfo"][0, -1] = np.inf
    assert any("ob_clip_reward_misinfo" in e for e in validate_file(demo_file).errors)
