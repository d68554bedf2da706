"""Policy inference server: session lifecycle + act over real HTTP."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arp_tpu.models.policy import ARPDT
from arp_tpu.serve import PolicyServer


@pytest.fixture(scope="module")
def server_url():
    model = ARPDT(
        config_updates=dict(
            model_type="vit_debug", transfer_type="none", emb_dim=32, depth=2,
            num_heads=4, mlp_ratio=2, use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15,
        patch_dim=16,
    )
    dummy = {
        "image": {"ob": np.zeros((1, 2, 32, 32, 3), np.float32)},
        "rtg": {"ob": np.zeros((1, 2, 1), np.float32)},
        "action": np.zeros((1, 2), np.int32),
        "instruct": None,
        "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, dummy, deterministic=True)["params"]

    @jax.jit
    def policy_fn_jit(params, inputs):
        return model.apply({"params": params}, inputs, method=model.greedy_action)

    server = PolicyServer(
        policy_fn=lambda inputs: policy_fn_jit(params, inputs),
        transform_obs_fn=lambda x: np.asarray(x, np.float32) / 255.0,
        window_size=4,
    )
    httpd = server.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_serve_session_lifecycle(server_url):
    health = json.loads(urllib.request.urlopen(server_url + "/v1/health").read())
    assert health["status"] == "ok"

    sid = _post(server_url + "/v1/session", {"return_to_go": 100.0, "scale": 100.0})["session_id"]
    obs = np.random.default_rng(0).integers(0, 256, size=(32, 32, 3)).tolist()
    r1 = _post(server_url + "/v1/act", {"session_id": sid, "observation": obs})
    assert 0 <= r1["action"] < 15
    assert r1["rtg"] == 100.0
    # reward decrements rtg
    r2 = _post(server_url + "/v1/act", {"session_id": sid, "observation": obs, "reward": 10.0})
    assert abs(r2["rtg"] - 90.0) < 1e-5
    # window keeps rolling past window_size without error
    for _ in range(5):
        r = _post(server_url + "/v1/act", {"session_id": sid, "observation": obs, "reward": 0.0})
    assert 0 <= r["action"] < 15
    _post(server_url + "/v1/session/close", {"session_id": sid})
    health = json.loads(urllib.request.urlopen(server_url + "/v1/health").read())
    assert health["sessions"] == 0


def test_serve_bad_request(server_url):
    try:
        _post(server_url + "/v1/act", {"observation": [[0]]})
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        # deliberate request validation (missing/unknown fields map to 400,
        # serve.py KeyError handler) — a crash would surface as 500
        assert e.code == 400


import urllib.error  # noqa: E402


def test_serve_unknown_session_is_410(server_url):
    """An expired/invalid session_id must map to 410, not 400 'missing field'
    (the client DID send the field) — r3 review finding."""
    obs = np.zeros((32, 32, 3), np.uint8).tolist()
    try:
        _post(server_url + "/v1/act", {"session_id": "deadbeef", "observation": obs})
        assert False, "should have errored"
    except urllib.error.HTTPError as e:
        assert e.code == 410
        assert "unknown or expired session" in json.loads(e.read())["error"]


# --- reward server -----------------------------------------------------------


@pytest.fixture(scope="module")
def reward_server_url():
    """RewardServer over the tiny CLIP engine from the reward-engine tests."""
    from arp_tpu.models.clip import CLIP
    from arp_tpu.reward.engine import ClipRewardEngine
    from arp_tpu.reward.serve import RewardServer
    from tests.test_reward_engine import IMG_SIZE, TINY_CFG, TinyTokenizer

    model = CLIP(**TINY_CFG)
    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rng.normal(size=(1, IMG_SIZE, IMG_SIZE, 3)).astype(np.float32)),
        jnp.asarray(TinyTokenizer()("x")),
    )
    engine = ClipRewardEngine(
        model=model, variables=variables, batch_size=8, resize_mode="pil",
        image_size=IMG_SIZE, tokenizer=TinyTokenizer(),
    )
    server = RewardServer(engine)
    httpd = server.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", engine
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_reward_serve_text_matches_engine(reward_server_url):
    url, engine = reward_server_url
    rng = np.random.default_rng(31)
    frames = rng.integers(0, 256, (5, 48, 48, 3), np.uint8)
    got = _post(f"{url}/v1/reward/text",
                {"frames": frames.tolist(), "text": "collect the coin."})["rewards"]
    want = engine.text_rewards(frames, "collect the coin.")
    np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=1e-5, atol=1e-6)
    # cached text features must not change the answer on a second request
    got2 = _post(f"{url}/v1/reward/text",
                 {"frames": frames.tolist(), "text": "collect the coin."})["rewards"]
    np.testing.assert_array_equal(got, got2)
    health = json.loads(urllib.request.urlopen(f"{url}/v1/health").read())
    assert health["status"] == "ok" and health["cached_texts"] >= 1
    assert health["frames_served"] >= 2 * len(frames) and health["mean_fps"] > 0


def test_reward_serve_goal_semantics(reward_server_url):
    url, engine = reward_server_url
    rng = np.random.default_rng(32)
    frames = rng.integers(0, 256, (4, 48, 48, 3), np.uint8)
    # default goal = last frame -> its own reward is 0
    got = _post(f"{url}/v1/reward/goal", {"frames": frames.tolist()})["rewards"]
    np.testing.assert_allclose(
        np.asarray(got, np.float32), engine.goal_rewards(frames), rtol=1e-5, atol=1e-6
    )
    assert got[-1] == 0.0
    # explicit goal image
    goal = rng.integers(0, 256, (48, 48, 3), np.uint8)
    got2 = _post(f"{url}/v1/reward/goal",
                 {"frames": frames.tolist(), "goal": goal.tolist()})["rewards"]
    np.testing.assert_allclose(
        np.asarray(got2, np.float32), engine.goal_rewards_vs(frames, goal),
        rtol=1e-5, atol=1e-6,
    )


def test_reward_serve_missing_field_is_400(reward_server_url):
    url, _ = reward_server_url
    req = urllib.request.Request(
        f"{url}/v1/reward/text", data=json.dumps({"frames": [[0]]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 400


def test_reward_serve_b64_wire_format(reward_server_url):
    """base64 raw-bytes frames (the production wire format) must give the
    same rewards as JSON lists, for both frames and the goal image."""
    import base64

    url, engine = reward_server_url
    rng = np.random.default_rng(33)
    frames = rng.integers(0, 256, (5, 48, 48, 3), np.uint8)
    goal = rng.integers(0, 256, (48, 48, 3), np.uint8)
    via_list = _post(f"{url}/v1/reward/text",
                     {"frames": frames.tolist(), "text": "go"})["rewards"]
    via_b64 = _post(f"{url}/v1/reward/text",
                    {"frames_b64": base64.b64encode(frames.tobytes()).decode(),
                     "frames_shape": list(frames.shape), "text": "go"})["rewards"]
    np.testing.assert_array_equal(via_list, via_b64)
    g_list = _post(f"{url}/v1/reward/goal",
                   {"frames": frames.tolist(), "goal": goal.tolist()})["rewards"]
    g_b64 = _post(f"{url}/v1/reward/goal",
                  {"frames_b64": base64.b64encode(frames.tobytes()).decode(),
                   "frames_shape": list(frames.shape),
                   "goal_b64": base64.b64encode(goal.tobytes()).decode(),
                   "goal_shape": list(goal.shape)})["rewards"]
    np.testing.assert_array_equal(g_list, g_b64)


def test_reward_serve_raw_wire_format(reward_server_url):
    """Raw-binary endpoints (zero encode/parse) match the JSON-list answers;
    missing headers are 400."""
    url, engine = reward_server_url
    rng = np.random.default_rng(34)
    frames = rng.integers(0, 256, (5, 48, 48, 3), np.uint8)
    goal = rng.integers(0, 256, (48, 48, 3), np.uint8)

    def post_raw(path, data, headers):
        req = urllib.request.Request(f"{url}{path}", data=data, headers=headers)
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["rewards"]

    want = _post(f"{url}/v1/reward/text",
                 {"frames": frames.tolist(), "text": "go"})["rewards"]
    got = post_raw("/v1/reward/text_raw", frames.tobytes(),
                   {"X-Frames-Shape": "5,48,48,3", "X-Text": "go"})
    np.testing.assert_array_equal(got, want)

    g_want = _post(f"{url}/v1/reward/goal",
                   {"frames": frames.tolist(), "goal": goal.tolist()})["rewards"]
    g_got = post_raw("/v1/reward/goal_raw", frames.tobytes() + goal.tobytes(),
                     {"X-Frames-Shape": "5,48,48,3", "X-Goal-Shape": "48,48,3"})
    np.testing.assert_array_equal(g_got, g_want)
    # default goal (no X-Goal-Shape header): last frame -> reward 0
    g_def = post_raw("/v1/reward/goal_raw", frames.tobytes(),
                     {"X-Frames-Shape": "5,48,48,3"})
    assert g_def[-1] == 0.0

    with pytest.raises(urllib.error.HTTPError) as exc:
        post_raw("/v1/reward/text_raw", frames.tobytes(), {"X-Text": "go"})
    assert exc.value.code == 400


def test_policy_serve_micro_batching():
    """max_batch>1 coalesces concurrent sessions' /act calls into fewer
    device dispatches AND returns exactly the actions the unbatched server
    gives (per-sample attention: batching is placement, not arithmetic)."""
    from concurrent.futures import ThreadPoolExecutor

    model = ARPDT(
        config_updates=dict(
            model_type="vit_debug", transfer_type="none", emb_dim=32, depth=2,
            num_heads=4, mlp_ratio=2, use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15,
        patch_dim=16,
    )
    dummy = {
        "image": {"ob": np.zeros((1, 2, 32, 32, 3), np.float32)},
        "rtg": {"ob": np.zeros((1, 2, 1), np.float32)},
        "action": np.zeros((1, 2), np.int32),
        "instruct": None,
        "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, dummy, deterministic=True)["params"]

    @jax.jit
    def policy_fn_jit(params, inputs):
        return model.apply({"params": params}, inputs, method=model.greedy_action)

    kw = dict(policy_fn=lambda i: policy_fn_jit(params, i),
              transform_obs_fn=lambda x: np.asarray(x, np.float32) / 255.0,
              window_size=4)
    plain = PolicyServer(**kw)
    # generous collection window: determinism under loaded CI beats latency
    batched = PolicyServer(**kw, max_batch=8, batch_wait_ms=200.0)

    rng = np.random.default_rng(7)
    n_sessions, n_steps = 6, 3
    obs = rng.integers(0, 256, (n_sessions, n_steps, 32, 32, 3), np.uint8)
    step_barrier = threading.Barrier(n_sessions)

    def run_episode(server, s, barrier=None):
        sid = server.create_session({"return_to_go": 10.0, "scale": 10.0})["session_id"]
        acts = []
        for t in range(n_steps):
            if barrier is not None:
                barrier.wait()  # all sessions' step-t requests leave together
            out = server.act({"session_id": sid,
                              "observation": obs[s, t].tolist(),
                              "reward": 0.1 if t else None})
            acts.append(out["action"])
        return acts

    want = [run_episode(plain, s) for s in range(n_sessions)]
    with ThreadPoolExecutor(n_sessions) as pool:
        got = list(pool.map(lambda s: run_episode(batched, s, step_barrier),
                            range(n_sessions)))

    assert got == want
    total_requests = n_sessions * n_steps
    assert batched._batcher.dispatches < total_requests, (
        f"no coalescing happened: {batched._batcher.dispatches} dispatches "
        f"for {total_requests} requests"
    )
    stats = batched.health()["batching"]
    assert stats["batched_requests"] == total_requests
    assert stats["mean_batch_occupancy"] > 1.0


def test_reward_serve_raw_validation_and_cache_keys(reward_server_url):
    """Malformed raw payloads are 400 (not silent 200s), and a list text
    never shares a cache entry with the string spelled like its JSON."""
    url, engine = reward_server_url
    rng = np.random.default_rng(35)
    frames = rng.integers(0, 256, (3, 48, 48, 3), np.uint8)

    def post_raw(path, data, headers):
        req = urllib.request.Request(f"{url}{path}", data=data, headers=headers)
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["rewards"]

    # goal_raw: body shorter than the shape headers imply -> 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        post_raw("/v1/reward/goal_raw", frames.tobytes()[:-10],
                 {"X-Frames-Shape": "3,48,48,3"})
    assert exc.value.code == 400
    # goal bytes appended but X-Goal-Shape omitted -> 400, not wrong rewards
    goal = rng.integers(0, 256, (48, 48, 3), np.uint8)
    with pytest.raises(urllib.error.HTTPError) as exc:
        post_raw("/v1/reward/goal_raw", frames.tobytes() + goal.tobytes(),
                 {"X-Frames-Shape": "3,48,48,3"})
    assert exc.value.code == 400
    # negative dim in the shape header -> 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        post_raw("/v1/reward/text_raw", frames.tobytes(),
                 {"X-Frames-Shape": "-1,48,48,3", "X-Text": "go"})
    assert exc.value.code == 400

    # cache-key collision: the literal string '["go"]' vs the list ["go"]
    r_str = _post(f"{url}/v1/reward/text",
                  {"frames": frames.tolist(), "text": '["go"]'})["rewards"]
    r_list = _post(f"{url}/v1/reward/text",
                   {"frames": frames.tolist(), "text": ["go"]})["rewards"]
    np.testing.assert_array_equal(
        r_list, engine.text_rewards(frames, ["go"]).astype(np.float32)
    )
    assert not np.array_equal(r_str, r_list)


def test_reward_serve_raw_unicode_text(reward_server_url):
    """X-Text is percent-encoded UTF-8: a non-ASCII instruction must give
    the same rewards through the raw endpoint as through JSON (which
    round-trips unicode natively)."""
    from urllib.parse import quote

    url, _ = reward_server_url
    rng = np.random.default_rng(36)
    frames = rng.integers(0, 256, (3, 48, 48, 3), np.uint8)
    text = "collecte la pièce dorée"
    want = _post(f"{url}/v1/reward/text",
                 {"frames": frames.tolist(), "text": text})["rewards"]
    req = urllib.request.Request(
        f"{url}/v1/reward/text_raw", data=frames.tobytes(),
        headers={"X-Frames-Shape": "3,48,48,3", "X-Text": quote(text)},
    )
    with urllib.request.urlopen(req) as resp:
        got = json.loads(resp.read())["rewards"]
    np.testing.assert_array_equal(got, want)


def test_policy_serve_warmup_covers_all_live_signatures():
    """warmup() pre-compiles exactly the signature set live traffic hits:
    every (window ramp-up length) x (micro-batcher bucket) shape seen by a
    real session run was already issued by warmup — no /act compiles."""
    model = ARPDT(
        config_updates=dict(
            model_type="vit_debug", transfer_type="none", emb_dim=32, depth=2,
            num_heads=4, mlp_ratio=2, use_discrete_action=True, num_ensembles=2,
        ),
        num_actions=15,
        patch_dim=16,
    )
    dummy = {
        "image": {"ob": np.zeros((1, 2, 32, 32, 3), np.float32)},
        "rtg": {"ob": np.zeros((1, 2, 1), np.float32)},
        "action": np.zeros((1, 2), np.int32),
        "instruct": None,
        "text_padding_mask": None,
    }
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, dummy, deterministic=True)["params"]

    @jax.jit
    def policy_fn_jit(params, inputs):
        return model.apply({"params": params}, inputs, method=model.greedy_action)

    seen: list = []
    phase = {"warmup": True}

    def recording_policy_fn(inputs):
        # shape AND dtype: both key the compiled-program cache
        sig = tuple(
            (np.shape(l), np.asarray(l).dtype.str) for l in jax.tree_util.tree_leaves(inputs)
        )
        seen.append(("warmup" if phase["warmup"] else "live", sig))
        return policy_fn_jit(params, inputs)

    transform = lambda x: np.asarray(x, np.float32) / 255.0
    server = PolicyServer(
        policy_fn=recording_policy_fn, transform_obs_fn=transform,
        window_size=4, max_batch=4, batch_wait_ms=1.0,
    )
    warmed = server.warmup(transform(np.zeros((32, 32, 3), np.uint8)))
    # windows 1..4 x buckets {1, 2, 4}
    assert warmed == [(w, b) for w in (1, 2, 3, 4) for b in (1, 2, 4)]
    phase["warmup"] = False

    # a real episode longer than the window (ramp-up + steady state), plus a
    # concurrent burst that exercises a >1 bucket
    rng = np.random.default_rng(0)
    sid = server.create_session({"return_to_go": 10.0, "scale": 10.0})["session_id"]
    for t in range(6):
        server.act({"session_id": sid,
                    "observation": rng.integers(0, 256, (32, 32, 3), np.uint8).tolist(),
                    "reward": 0.1 if t else None})
    from concurrent.futures import ThreadPoolExecutor

    sids = [server.create_session({})["session_id"] for _ in range(3)]
    with ThreadPoolExecutor(3) as pool:
        list(pool.map(
            lambda s: server.act({"session_id": s,
                                  "observation": np.zeros((32, 32, 3), np.uint8).tolist()}),
            sids,
        ))

    warm_sigs = {sig for ph, sig in seen if ph == "warmup"}
    live_sigs = {sig for ph, sig in seen if ph == "live"}
    assert live_sigs, "no live traffic recorded"
    assert live_sigs <= warm_sigs, f"unwarmed live signatures: {live_sigs - warm_sigs}"


def test_reward_serve_warmup_compiles_and_calibrates():
    """RewardServer.warmup on an int8 engine runs the one-shot activation
    calibration (on the warmup frames, which stand in for real data) and
    leaves request handling identical to an engine whose first REQUEST
    carried the same frames."""
    from arp_tpu.reward.engine import ClipRewardEngine
    from arp_tpu.reward.serve import RewardServer
    from arp_tpu.testing import TinyTokenizer, make_tiny_clip_engine

    base = make_tiny_clip_engine(batch_size=8)
    kw = dict(model=base.model, variables=base.variables, batch_size=8,
              resize_mode="pil", image_size=base.image_size,
              tokenizer=TinyTokenizer(), fast_int8=True)
    warmed_eng, lazy_eng = ClipRewardEngine(**kw), ClipRewardEngine(**kw)

    rng = np.random.default_rng(5)
    calib = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    server = RewardServer(warmed_eng)
    server.warmup(calib)
    assert warmed_eng._fast_q is not None and not warmed_eng._needs_calib

    # lazy engine calibrates on its first request — feed it the same frames
    lazy_first = lazy_eng.text_rewards(calib, "collect the coin.")

    frames = rng.integers(0, 256, (5, 64, 64, 3), np.uint8)
    got = server.text_rewards({"frames": frames.tolist(), "text": "collect the coin."})
    want = lazy_eng.text_rewards(frames, "collect the coin.")
    np.testing.assert_array_equal(np.asarray(got["rewards"], np.float32),
                                  want.astype(np.float32))
    del lazy_first


def test_policy_serve_hot_reload(tmp_path):
    """POST /v1/reload picks up the latest trainer checkpoint without a
    restart: drives the real CLI main() (monkeypatched serve_forever),
    saves a checkpoint AFTER startup, reloads, and checks the served action
    now matches the new weights (computed independently) and /v1/health
    reports the step."""
    import sys as _sys
    import optax
    from flax.training.train_state import TrainState

    import arp_tpu.serve as S
    from arp_tpu.checkpoint import CheckpointManager
    from arp_tpu.ops.augment import make_eval_transform

    ckpt_dir = str(tmp_path / "ckpt")
    argv = ["serve", "--checkpoint_dir", ckpt_dir, "--allow_random_init",
            "--port", "0", "--window_size", "2", "--image_size", "32",
            "--emb_dim", "32", "--depth", "2", "--num_heads", "4",
            "--model_type", "vit_debug"]
    started = {"evt": threading.Event()}
    orig_argv, orig_serve = _sys.argv, S.ThreadingHTTPServer.serve_forever

    def capture(self, *a, **k):
        started["port"] = self.server_address[1]
        started["server"] = self
        started["evt"].set()
        orig_serve(self, *a, **k)

    _sys.argv, S.ThreadingHTTPServer.serve_forever = argv, capture
    try:
        t = threading.Thread(target=S.main, daemon=True)
        t.start()
        assert started["evt"].wait(300), "server did not start"
    finally:
        _sys.argv, S.ThreadingHTTPServer.serve_forever = orig_argv, orig_serve

    url = f"http://127.0.0.1:{started['port']}"
    try:
        # save a checkpoint with fresh (differently-seeded) params
        model = ARPDT(
            config_updates=dict(model_type="vit_debug", transfer_type="none",
                                emb_dim=32, depth=2, num_heads=4,
                                use_discrete_action=True),
            num_actions=15, patch_dim=16,
        )
        dummy = {
            "image": {"ob": np.zeros((1, 2, 32, 32, 3), np.float32)},
            "rtg": {"ob": np.zeros((1, 2, 1), np.float32)},
            "action": np.zeros((1, 2), np.int32),
            "instruct": None, "text_padding_mask": None,
        }
        rngs = {"params": jax.random.PRNGKey(9), "noise": jax.random.PRNGKey(10),
                "dropout": jax.random.PRNGKey(11)}
        new_params = model.init(rngs, dummy, deterministic=True)["params"]
        state = TrainState.create(apply_fn=model.apply, params=new_params,
                                  tx=optax.sgd(1e-3))
        CheckpointManager(ckpt_dir).save(7, jax.device_get(state),
                                         metadata={"step": 7}, wait=True)

        out = _post(url + "/v1/reload", {})
        assert out["status"] == "reloaded" and out["step"] == 7, out

        with urllib.request.urlopen(url + "/v1/health") as r:
            health = json.loads(r.read())
        assert health["checkpoint"]["step"] == 7, health

        # served action == greedy action under the NEW weights, computed here
        obs = np.full((32, 32, 3), 128, np.uint8)
        sid = _post(url + "/v1/session", {"return_to_go": 10.0, "scale": 10.0})["session_id"]
        got = _post(url + "/v1/act", {"session_id": sid, "observation": obs.tolist()})

        transform = make_eval_transform(image_size=32)
        tobs = np.asarray(transform(obs))
        inputs = {
            "image": {"ob": tobs[None, None]},
            "rtg": {"ob": np.asarray([[[1.0]]], np.float32)},
            "action": np.zeros((1, 1), np.int32),
            "instruct": None, "text_padding_mask": None,
        }
        want = int(np.asarray(model.apply({"params": new_params}, inputs,
                                          method=model.greedy_action))[0])
        assert got["action"] == want, (got, want)
    finally:
        started["server"].shutdown()
