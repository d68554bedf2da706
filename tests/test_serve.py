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
