"""Reward-serving throughput: HTTP front vs direct engine calls.

Measures what a rollout fleet sees when querying ``arp_tpu.reward.serve``
over localhost with the production b64 wire format, against the same
engine called in-process — isolating the serialization+HTTP overhead from
the device pipeline.  Same workload and engine construction as bench.py
(random-init ViT-B/16, bf16, batch 256, 2048 frames), so the jitted
programs come out of the persistent XLA cache.

Usage: PYTHONPATH=/root/repo[:/root/.axon_site] python scripts/bench_reward_serve.py
       [--smoke]   (tiny model, CPU-friendly contract check)
"""

import argparse
import base64
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    parser.add_argument("--frames", type=int, default=2048)
    parser.add_argument("--passes", type=int, default=3)
    args = parser.parse_args()

    from arp_tpu.models.clip import CLIP, CONFIGS
    from arp_tpu.reward.engine import ClipRewardEngine
    from arp_tpu.reward.serve import RewardServer

    cfg = dict(CONFIGS["vit_b16"])
    image_size, batch_size, n_frames, src = 224, 256, args.frames, 256
    if args.smoke:
        cfg.update(vision_num_layers=1, vision_features=64, vision_patch_size=8,
                   text_num_layers=1, text_features=64, embed_dim=32, text_num_heads=4)
        image_size, batch_size, n_frames, src = 32, 8, 32, 64
    model = CLIP(**cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    )
    engine = ClipRewardEngine(
        model=model, variables=variables, batch_size=batch_size,
        resize_mode="pil", compute_dtype=jnp.bfloat16, image_size=image_size,
    )
    # a plain string rides JSON; the (fallback) BPE tokenizer is deterministic
    # and both paths amortize the text encode (server: per-text cache)
    text = "collect the coin."
    txt_feat = engine.encode_text_features(text)

    server = RewardServer(engine)
    httpd = server.make_http_server("127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)

    def post(frames):
        body = json.dumps({
            "frames_b64": base64.b64encode(frames.tobytes()).decode(),
            "frames_shape": list(frames.shape),
            "text": text,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reward/text", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["rewards"]

    def post_raw(frames):
        from urllib.parse import quote

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/reward/text_raw", data=frames.tobytes(),
            headers={"X-Frames-Shape": ",".join(map(str, frames.shape)),
                     "X-Text": quote(text)},
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())["rewards"]

    # warmup/compile both paths, then best-of-N with fresh frames per pass
    warm = rng.integers(0, 256, (batch_size, src, src, 3), np.uint8)
    engine.text_rewards_with_features(warm, txt_feat)
    post(warm)
    post_raw(warm)

    results = {}
    for name, call in (("direct", lambda f: engine.text_rewards_with_features(f, txt_feat)),
                       ("http_b64", post),
                       ("http_raw", post_raw)):
        best = float("inf")
        for p in range(args.passes):
            frames = rng.integers(0, 256, (n_frames, src, src, 3), np.uint8)
            t0 = time.time()
            r = call(frames)
            best = min(best, time.time() - t0)
            assert np.isfinite(np.asarray(r)).all()
        results[name] = round(n_frames / best, 1)
    for mode in ("http_b64", "http_raw"):
        results[f"{mode}_overhead_pct"] = round(
            100.0 * (results["direct"] / results[mode] - 1.0), 1
        )
    httpd.shutdown()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
