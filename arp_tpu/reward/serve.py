"""Reward inference server — ``python -m arp_tpu.reward.serve``.

Serves the batched CLIP reward engine (the north-star component) over HTTP so
CPU rollout fleets can query multimodal rewards from one TPU host — the
serving-side counterpart of the offline labeler.  The reference computes
rewards only in-process (arp_dt/envs/vl_reward.py); here the same engine that
powers labeling/eval sits behind a thin stdlib JSON front (swap in an ASGI
server when deploying for real), optionally mesh-sharded (``--mesh_dp``) and
int8 (``--fast_int8``).

API (JSON over HTTP):
  POST /v1/reward/text  {"frames": [[...]] uint8 (N,H,W,C), "text": str | [str]}
                        -> {"rewards": [N floats]}
                        logit_scale * cos(f_img, f_text), averaged over texts
                        (label_reward.py:132-146 semantics); text features are
                        cached per distinct text across requests.
  POST /v1/reward/goal  {"frames": ..., "goal": [[...]] uint8 (H,W,C) optional}
                        -> {"rewards": [N floats]}
                        -||f_img - f_goal||_2 on unnormalized features; the
                        goal defaults to the last frame (label_reward.py:148-163).
  GET  /v1/health       -> {"status": "ok", "engine": ..., "batch_size": N}

Frame wire formats, cheapest first:
  * raw binary: POST ``/v1/reward/text_raw`` / ``/v1/reward/goal_raw`` with
    the uint8 frame bytes as the body and headers ``X-Frames-Shape:
    "N,H,W,C"``, ``X-Text: <percent-encoded UTF-8 instruction>`` (text) or
    optional ``X-Goal-Shape`` with the goal bytes appended after the frames
    (goal) — zero encode/parse cost, the production format;
  * base64 JSON: ``{"frames_b64": base64(arr.tobytes()), "frames_shape":
    [N,H,W,C]}`` (same for ``goal_b64``/``goal_shape``);
  * nested JSON lists (debug-friendly).
On the tunnel-attached dev chip all three measure within noise of direct
engine calls (the host->device link dominates); on a PCIe-attached host the
raw format is the one that keeps HTTP off the critical path
(scripts/bench_reward_serve.py).
"""

from __future__ import annotations

import base64
import json
import threading
import time

import numpy as np

from ..serve import make_json_http_server


def _decode_frames(body: dict, key: str):
    """uint8 array from JSON lists (``key``) or base64 raw bytes
    (``key_b64`` + ``key_shape``); None if neither field is present."""
    b64 = body.get(f"{key}_b64")
    if b64 is not None:
        arr = np.frombuffer(base64.b64decode(b64), np.uint8)
        return arr.reshape(body[f"{key}_shape"])
    if body.get(key) is not None:
        return np.asarray(body[key], np.uint8)
    return None


class RewardServer:
    """HTTP front over a ClipRewardEngine (or the ClipFt adapter subclass).

    One device-side engine is shared across requests; a lock serializes
    encode dispatches (concurrent batched encodes would contend for the same
    chip anyway — scale out with ``mesh=`` instead).
    """

    MAX_CACHED_TEXTS = 256  # LRU bound: long-lived servers fed per-episode
    # instruction strings must not grow host memory without limit

    def __init__(self, engine):
        from collections import OrderedDict

        self.engine = engine
        self._text_feats: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._lock = threading.Lock()
        self.frames_served = 0
        self.busy_seconds = 0.0

    def _text_rewards(self, frames: np.ndarray, text) -> dict:
        # type-prefixed key: the string '["go"]' and the list ["go"] encode
        # different texts and must not share a cache entry
        if isinstance(text, (list, tuple)):
            key = "list:" + json.dumps(list(text))
        else:
            key = "str:" + str(text)
        with self._lock:
            feat = self._text_feats.get(key)
            if feat is None:
                feat = self.engine.encode_text_features(text)
                self._text_feats[key] = feat
                if len(self._text_feats) > self.MAX_CACHED_TEXTS:
                    self._text_feats.popitem(last=False)
            else:
                self._text_feats.move_to_end(key)
            t0 = time.monotonic()
            rewards = self.engine.text_rewards_with_features(frames, feat)
            self.busy_seconds += time.monotonic() - t0
            self.frames_served += len(frames)
        return {"rewards": np.asarray(rewards, np.float32).tolist()}

    def warmup(self, frames: np.ndarray) -> None:
        """Compile the encode + text programs before serving (and, under
        fast_int8, run the one-shot activation-scale calibration) so the
        first client request never pays for them.  ``frames`` must be REAL
        observations when the engine is int8: the calibration batch defines
        the static activation scales for every later request."""
        self.engine.encode_image_features(np.asarray(frames))
        self.engine.encode_text_features("warmup")

    def _goal_rewards(self, frames: np.ndarray, goal) -> dict:
        with self._lock:
            t0 = time.monotonic()
            if goal is not None:
                rewards = self.engine.goal_rewards_vs(frames, goal)
            else:
                rewards = self.engine.goal_rewards(frames, goal_index=-1)
            self.busy_seconds += time.monotonic() - t0
            self.frames_served += len(frames)
        return {"rewards": np.asarray(rewards, np.float32).tolist()}

    def text_rewards(self, body: dict) -> dict:
        frames = _decode_frames(body, "frames")
        if frames is None:
            raise KeyError("frames")
        return self._text_rewards(frames, body["text"])

    def goal_rewards(self, body: dict) -> dict:
        frames = _decode_frames(body, "frames")
        if frames is None:
            raise KeyError("frames")
        return self._goal_rewards(frames, _decode_frames(body, "goal"))

    # -- raw binary wire format ------------------------------------------------

    @staticmethod
    def _header_shape(headers, name: str):
        val = headers.get(name)
        if val is None:
            return None
        shape = [int(s) for s in val.split(",")]
        if any(d <= 0 for d in shape):
            # no numpy -1 inference here: byte offsets below depend on the
            # exact element count, so every dim must be explicit
            raise ValueError(f"{name} must be positive dims, got {val!r}")
        return shape

    def text_rewards_raw(self, headers, data: bytes) -> dict:
        shape = self._header_shape(headers, "X-Frames-Shape")
        text = headers.get("X-Text")
        if shape is None:
            raise KeyError("X-Frames-Shape")
        if text is None:
            raise KeyError("X-Text")
        # X-Text is percent-encoded UTF-8: HTTP headers are latin-1 on the
        # wire, so raw non-ASCII instructions would silently mojibake.
        # Clients must urllib.parse.quote() the text; plain ASCII without
        # '%' passes through unchanged.
        from urllib.parse import unquote

        text = unquote(text, encoding="utf-8")
        frames = np.frombuffer(data, np.uint8).reshape(shape)
        return self._text_rewards(frames, text)

    def goal_rewards_raw(self, headers, data: bytes) -> dict:
        shape = self._header_shape(headers, "X-Frames-Shape")
        if shape is None:
            raise KeyError("X-Frames-Shape")
        goal_shape = self._header_shape(headers, "X-Goal-Shape")
        n = int(np.prod(shape))
        expected = n + (int(np.prod(goal_shape)) if goal_shape is not None else 0)
        if len(data) != expected:
            # a silent mismatch would score truncated/mis-offset frames as 200
            raise ValueError(
                f"body is {len(data)} bytes but the shape headers imply {expected}"
            )
        frames = np.frombuffer(data[:n], np.uint8).reshape(shape)
        goal = None
        if goal_shape is not None:
            goal = np.frombuffer(data[n:], np.uint8).reshape(goal_shape)
        return self._goal_rewards(frames, goal)

    def health(self) -> dict:
        return {
            "status": "ok",
            "engine": type(self.engine).__name__,
            "batch_size": self.engine.batch_size,
            "cached_texts": len(self._text_feats),
            "frames_served": self.frames_served,
            "busy_seconds": round(self.busy_seconds, 3),
            "mean_fps": round(self.frames_served / max(self.busy_seconds, 1e-9), 1),
        }

    def make_http_server(self, host: str = "127.0.0.1", port: int = 8788):
        return make_json_http_server(
            get_routes={"/v1/health": self.health},
            post_routes={
                "/v1/reward/text": self.text_rewards,
                "/v1/reward/goal": self.goal_rewards,
            },
            raw_post_routes={
                "/v1/reward/text_raw": self.text_rewards_raw,
                "/v1/reward/goal_raw": self.goal_rewards_raw,
            },
            host=host,
            port=port,
        )


def main():
    import argparse

    import jax.numpy as jnp

    from ..parallel.mesh import mesh_from_count
    from .engine import ClipRewardEngine

    parser = argparse.ArgumentParser(description="Serve CLIP rewards over HTTP (TPU).")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8788)
    parser.add_argument("--model_type", default="clip",
                        help="clip | clip_ft (requires --model_ckpt_dir)")
    parser.add_argument("--model_ckpt_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=64,
                        help="device batch; online request batches pad up to it")
    parser.add_argument("--resize_mode", default="pil", choices=["pil", "host", "fast"])
    parser.add_argument("--use_crop", type=lambda s: s.lower() in ("1", "true"), default=False)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--fast_int8", action="store_true")
    parser.add_argument("--fast_int8_attn", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="w8a8 attention on the int8 fast path (int8 QK^T "
                             "and P@V with static scales; needs --fast_int8). "
                             "Unset = the engine's measured default (True on "
                             "v5e under --fast_int8, round-4 A/B)")
    parser.add_argument("--mesh_dp", type=int, default=0,
                        help="shard encode batches data-parallel over a mesh of this "
                             "many devices (-1 = all local devices; 0 = single device)")
    parser.add_argument("--warmup", action="store_true",
                        help="compile the encode + text programs before accepting "
                             "requests, so the first client never pays the jit")
    parser.add_argument("--warmup_frames", default=None,
                        help="hdf5 'path[:dataset]' of REAL frames for warmup "
                             "(required with --fast_int8 --warmup: the int8 "
                             "activation scales calibrate on the first batch, "
                             "which must be representative, not zeros)")
    args = parser.parse_args()
    if args.warmup and args.fast_int8 and not args.warmup_frames:
        parser.error("--warmup with --fast_int8 needs --warmup_frames (real frames "
                     "calibrate the int8 activation scales; synthetic ones would "
                     "mis-scale every later request)")

    mesh = mesh_from_count(args.mesh_dp)
    if args.model_type.startswith("clip_ft"):
        assert args.model_ckpt_dir is not None, "clip_ft needs --model_ckpt_dir"
        from ..finetune.reward import ClipFtRewardEngine, load_adapter_params

        engine = ClipFtRewardEngine(
            adapter_params=load_adapter_params(args.model_ckpt_dir),
            batch_size=args.batch_size,
            use_crop=args.use_crop,
            fast_encode=args.fast,
            fast_int8=args.fast_int8,
            fast_int8_attn=args.fast_int8_attn,
            mesh=mesh,
        )
    else:
        engine = ClipRewardEngine(
            batch_size=args.batch_size,
            resize_mode=args.resize_mode,
            use_crop=args.use_crop,
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            fast_encode=args.fast,
            fast_int8=args.fast_int8,
            fast_int8_attn=args.fast_int8_attn,
            mesh=mesh,
        )
    server = RewardServer(engine)
    if args.warmup:
        if args.warmup_frames:
            import h5py

            path, _, key = args.warmup_frames.partition(":")
            with h5py.File(path, "r") as g:
                ds = g[key or "ob"]
                # stacked-window files (N, F, H, W, C): read only the windows
                # needed to cover batch_size frames, not batch_size windows
                rows = args.batch_size
                if ds.ndim == 5:
                    rows = -(-args.batch_size // ds.shape[1])
                frames = np.asarray(ds[:rows])
            frames = frames.reshape((-1,) + frames.shape[-3:])[: args.batch_size]
        else:
            frames = np.random.default_rng(0).integers(
                0, 256, (args.batch_size, 64, 64, 3), np.uint8
            )
        t0 = time.time()
        server.warmup(frames)
        print(f"warmed encode+text programs on {len(frames)} frames "
              f"in {time.time()-t0:.1f}s")
    httpd = server.make_http_server(args.host, args.port)
    print(f"serving {type(engine).__name__} rewards on http://{args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
