"""Profiling, resilience, mixup/cutmix, logging, checkpoint tests."""

import os
import signal
import time

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.logging_utils import MetricsLogger
from arp_tpu.ops.augment import mixup_cutmix
from arp_tpu.profiling import ProfileAccumulator, StepTimer
from arp_tpu.resilience import FaultDetector, Heartbeat, PreemptionHandler


def test_profile_accumulator():
    prof = ProfileAccumulator()
    with prof("stepping"):
        time.sleep(0.01)
    with prof("stepping"):
        time.sleep(0.01)
    out = prof.dump()
    assert out["wait_stepping"] >= 0.02
    assert out["mean_stepping"] >= 0.01


def test_step_timer():
    t = StepTimer()
    t.tick()
    time.sleep(0.005)
    t.tick()
    m = t.metrics(batch_size=32)
    assert m["perf/examples_per_sec"] > 0


def test_fault_detector():
    det = FaultDetector(spike_factor=10.0, warmup=5)
    for _ in range(5):
        assert det.check(1.0) == "ok"
    assert det.check(float("nan")) == "nan"
    assert det.check(100.0) == "spike"
    assert det.check(1.1) == "ok"


def test_preemption_handler():
    handler = PreemptionHandler(signals=(signal.SIGUSR1,))
    assert not handler.should_stop
    os.kill(os.getpid(), signal.SIGUSR1)
    time.sleep(0.05)
    assert handler.should_stop
    handler.restore()


def test_heartbeat(tmp_path):
    hb = Heartbeat(str(tmp_path / "hb"), interval_s=0.0)
    hb.beat(step=3)
    assert (tmp_path / "hb").read_text().strip().endswith("3")


def test_mixup_cutmix():
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(np.random.default_rng(0).uniform(size=(8, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8) % 4)
    out_img, out_lab = mixup_cutmix(rng, images, labels, num_classes=4)
    assert out_img.shape == images.shape
    assert out_lab.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out_lab.sum(-1)), 1.0, atol=1e-5)


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger({"output_dir": str(tmp_path), "online": False}, variant={"a": 1})
    logger.log({"loss": 0.5, "arr": np.float32(2.0)})
    logger.close()
    import json

    path = os.path.join(logger.output_dir, "metrics.jsonl")
    rec = json.loads(open(path).read().strip())
    assert rec["loss"] == 0.5 and rec["arr"] == 2.0


def test_checkpoint_roundtrip(tmp_path):
    import optax
    from flax.training.train_state import TrainState

    from arp_tpu.checkpoint import CheckpointManager

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = TrainState.create(apply_fn=lambda: None, params=params, tx=optax.adam(1e-3))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(5, jax.device_get(state), metadata={"step": 5}, wait=True)
    restored, meta = mngr.restore(jax.device_get(state))
    assert meta["step"] == 5
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.0)
    assert mngr.latest_step() == 5
    # best tracking
    assert mngr.save_best(6, jax.device_get(state), score=1.0)
    assert not mngr.save_best(7, jax.device_get(state), score=0.5)
    mngr.close()


def test_checkpoint_best_score_survives_resume(tmp_path):
    """best_score persists via best/metadata: a post-restart worse score must
    NOT clobber the saved best model (regression: in-memory -inf reset)."""
    import optax
    from flax.training.train_state import TrainState

    from arp_tpu.checkpoint import CheckpointManager

    params = {"w": jnp.ones((2,))}
    state = TrainState.create(apply_fn=lambda: None, params=params, tx=optax.adam(1e-3))
    d = str(tmp_path / "ckpt")
    mngr = CheckpointManager(d)
    assert mngr.save_best(1, jax.device_get(state), score=9.5)
    mngr.close()
    # new process/manager: must reload 9.5, not -inf
    mngr2 = CheckpointManager(d)
    assert mngr2.best_score == 9.5
    assert not mngr2.save_best(2, jax.device_get(state), score=3.1)
    assert mngr2.save_best(3, jax.device_get(state), score=9.6)
    mngr2.close()


def test_checkpoint_restore_params_without_template(tmp_path):
    """restore_params needs no optimizer template — the serve path must load
    trainer checkpoints saved with any optax chain (regression: an
    optax.identity template made every serve restore fail silently)."""
    import optax
    from flax.training.train_state import TrainState

    from arp_tpu.checkpoint import CheckpointManager

    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3)}}
    state = TrainState.create(
        apply_fn=lambda: None, params=params,
        tx=optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3)),
    )
    d = str(tmp_path / "ckpt")
    mngr = CheckpointManager(d)
    mngr.save(3, jax.device_get(state), metadata={"step": 3}, wait=True)
    mngr.close()
    got, meta = CheckpointManager(d).restore_params()
    assert meta["step"] == 3
    np.testing.assert_array_equal(
        np.asarray(got["dense"]["kernel"]), np.arange(6.0).reshape(2, 3)
    )


def test_hindsight_goal_sampling_deterministic(tmp_path):
    """Two fresh loaders with the same seed produce identical goal frames —
    exact-resume requires the dataset's own sampling to be seeded, not the
    global np.random (which the reference uses, data_procgen.py:188)."""
    import h5py

    from arp_tpu.data.loader import DataLoader
    from arp_tpu.data.procgen_dataset import ProcgenDataset

    root = tmp_path / "demos" / "coinrun_hard"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n, f = 24, 4
    with h5py.File(root / "data_train.hdf5", "w") as g:
        g.create_dataset("ob", data=rng.integers(0, 256, size=(n, f, 8, 8, 3), dtype=np.uint8))
        g.create_dataset("act", data=rng.integers(0, 15, size=(n, f)).astype(np.int64))
        done = np.zeros((n, f), bool)
        done[11, -1] = done[n - 1, -1] = True
        g.create_dataset("done", data=done)

    def goals(seed):
        ds = ProcgenDataset(
            {"path": str(tmp_path / "demos"), "num_frames": 4, "window_size": 2},
            dataset_name="coinrun_hard", split="train",
        )
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=seed, num_workers=2)
        out = []
        for _, b in zip(range(3), loader.epochs()):
            out.append(np.asarray(b["goal"]["ob"]))
        return np.concatenate(out)

    np.testing.assert_array_equal(goals(7), goals(7))
    assert not np.array_equal(goals(7), goals(8))
