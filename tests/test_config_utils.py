"""config system + prefetch utilities coverage."""

import jax
import numpy as np
from ml_collections import ConfigDict

from arp_tpu.config import flatten_config_dict, prefix_metrics, update_config
from arp_tpu.parallel import MeshConfig, create_mesh, prefetch_to_device
from arp_tpu.parallel.prefetch import ThreadedPrefetch
from arp_tpu.rng import RngStream, next_rng, set_random_seed
from arp_tpu.utils import compute_scale, symexp, symlog


def test_flatten_config_dict():
    cfg = ConfigDict({"a": 1, "sub": ConfigDict({"b": "x", "deep": ConfigDict({"c": 2.0})})})
    flat = flatten_config_dict(cfg)
    assert flat == {"a": 1, "sub.b": "x", "sub.deep.c": 2.0}


def test_update_config():
    cfg = ConfigDict({"x": 1, "y": "a"})
    update_config(cfg, {"x": 5})
    assert cfg.x == 5 and cfg.y == "a"


def test_prefix_metrics():
    assert prefix_metrics({"loss": 1.0}, "train") == {"train/loss": 1.0}


def test_rng_stream():
    set_random_seed(0)
    a = next_rng()
    b = next_rng()
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    keys = next_rng(["params", "noise"])
    assert set(keys) == {"params", "noise"}
    three = next_rng(3)
    assert len(three) == 3
    s = RngStream.from_seed(7)
    assert s() is not None


def test_symlog_symexp_roundtrip():
    x = np.asarray([-100.0, -1.0, 0.0, 2.5, 1e4], np.float32)
    back = np.asarray(symexp(symlog(x)))
    np.testing.assert_allclose(back, x, rtol=1e-4)


def test_compute_scale():
    assert compute_scale(700) == 1000  # leading digit >= 5 rounds the scale up
    assert compute_scale(400) == 100
    assert compute_scale(40) == 10
    assert compute_scale(4000) == 1000


def test_prefetch_to_device():
    mesh = create_mesh(MeshConfig(dp=-1))
    batches = [{"x": np.full((8, 4), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2, mesh=mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_allclose(np.asarray(b["x"]), i)
        assert b["x"].sharding.spec is not None


def test_threaded_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = ThreadedPrefetch(gen(), capacity=2)
    assert next(it) == 1
    try:
        next(it)
        assert False, "should raise"
    except RuntimeError as e:
        assert "boom" in str(e)


def test_threaded_prefetch_close_then_next_raises():
    """close() must leave the sentinel armed: post-close iteration raises
    StopIteration instead of blocking (ADVICE r2), including at capacity=1
    where the producer can block twice during shutdown.  Runs under a
    watchdog so the deadlock-class regression FAILS instead of hanging CI."""
    import threading

    import pytest

    def scenario():
        tp = ThreadedPrefetch(iter(range(10)), capacity=1)
        assert next(tp) == 0
        tp.close()
        with pytest.raises(StopIteration):
            next(tp)

        # close after natural exhaustion is also safe
        tp2 = ThreadedPrefetch(iter(range(2)), capacity=4)
        assert list(tp2) == [0, 1]
        tp2.close()
        with pytest.raises(StopIteration):
            next(tp2)

    failures = []

    def run():
        try:
            scenario()
        except BaseException as e:  # surfaced in the main thread
            failures.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=30.0)
    assert not t.is_alive(), "prefetch close/next deadlocked (watchdog hit)"
    assert not failures, failures
