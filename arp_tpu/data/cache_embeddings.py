"""Frozen-encoder embedding cache — ``python -m arp_tpu.data.cache_embeddings``.

The reference re-encodes every frame through the frozen CLIP/M3AE encoder on
every training step (ARPDT.py:338, 451-458) — the bulk of its training FLOPs.
This tool precomputes per-step embeddings once (eval preprocessing, no
augmentation) and writes them into the demo HDF5 as ``{key}_{name}_emb``;
the policies consume them via ``transfer_type="..._cached"`` and train only
the small decision transformer + heads.

Semantics note (SURVEY.md §7 hard part 4): the reference augments *before*
the frozen encoder, so cached embeddings see un-augmented frames.  Both modes
exist; cached mode trades that augmentation for a ~10-100x train-step
speedup.
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def cache_clip_embeddings(
    data_path: str,
    engine,
    image_keys: str = "ob",
    name: str = "clip",
    batch_note: bool = True,
) -> dict:
    """Write L2-normalized CLIP embeddings for every step's last frame."""
    from ..reward.labeler import LastFrameWindow

    stats = {}
    with h5py.File(data_path, "a") as g:
        for key in image_keys.split(", "):
            # lazy window: O(batch) host memory for any file size (an eager
            # g[key][:, -1] is tens of GB at production scale)
            frames = LastFrameWindow(g[key])
            emb = engine.encode_image_features(frames, normalize=True)
            out_key = f"{key}_{name}_emb"
            if out_key in g:
                del g[out_key]
            g.create_dataset(out_key, data=emb.astype(np.float32), compression="gzip")
            stats[key] = emb.shape
    return stats


def main():
    p = argparse.ArgumentParser(description="Precompute frozen-encoder embeddings.")
    p.add_argument("--data_path", required=True)
    p.add_argument("--image_keys", default="ob")
    p.add_argument("--model_name", default="vit_b16")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="packed fused-QKV encode path (ops/vit_infer.py)")
    p.add_argument("--fast_int8", action="store_true",
                   help="static-int8 MXU encode (calibrated on the first batch)")
    p.add_argument("--fast_score_bf16", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="bf16 attention scores/softmax on the fast paths. "
                        "Unset = the engine's measured default (True on v5e, "
                        "round-4 series); --no-fast_score_bf16 forces fp32 softmax")
    p.add_argument("--fast_int8_attn", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="w8a8 attention on the int8 fast path (int8 QK^T and "
                        "P@V with static scales; needs --fast_int8). Unset = "
                        "the engine's measured default (True on v5e, round-4 A/B)")
    p.add_argument("--mesh_dp", type=int, default=0,
                   help="shard encode batches data-parallel over a mesh of this "
                        "many devices (-1 = all local devices; 0 = single device)")
    args = p.parse_args()

    import jax.numpy as jnp

    from ..reward.engine import ClipRewardEngine

    from ..parallel.mesh import mesh_from_count

    mesh = mesh_from_count(args.mesh_dp)
    if mesh is not None:
        print(f"[INFO] encoding data-parallel over {mesh.devices.size} devices")

    engine = ClipRewardEngine(
        model_name=args.model_name,
        batch_size=args.batch_size,
        resize_mode="pil",
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        fast_encode=args.fast,
        fast_int8=args.fast_int8,
        fast_score_bf16=args.fast_score_bf16,
        fast_int8_attn=args.fast_int8_attn,
        mesh=mesh,
    )
    stats = cache_clip_embeddings(args.data_path, engine, args.image_keys)
    print(f"[DONE] cached embeddings: {stats}")


if __name__ == "__main__":
    main()
