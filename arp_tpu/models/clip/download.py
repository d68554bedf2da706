"""Guarded OpenAI CLIP checkpoint downloader with sha256 verification.

Off by default: this framework targets egress-free environments, so nothing
in the library triggers network IO unless the caller explicitly opts in
(``allow_download=True`` or ``ARP_TPU_ALLOW_DOWNLOAD=1``).  When egress
exists, ``fetch_checkpoint`` downloads the official OpenAI torch archive,
verifies the sha256 embedded in its URL path, and caches it for
``load_model_vars``.  Capability match: reference openai/download.py:17-72 +
model.py:17-28 (URL table published at github.com/openai/CLIP).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import urllib.request
from typing import Optional

# Official OpenAI checkpoint URLs; the path component before the filename is
# the file's sha256 (the same convention the reference relies on).
CHECKPOINT_URLS = {
    "resnet_50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "resnet_101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "resnet_50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "resnet_50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "resnet_50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "vit_b32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "vit_b16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "vit_l14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}
CHECKPOINT_URLS["vit_b32_clip4clip"] = CHECKPOINT_URLS["vit_b32"]
CHECKPOINT_URLS["vit_b16_clip4clip"] = CHECKPOINT_URLS["vit_b16"]

# Small redistributable tokenizer assets.  Exact CLIP text ids need the BPE
# merges file (reference auto-downloads it, openai/tokenizer.py:43-64); m3ae
# instruction ids need the BERT wordpiece vocab (data_procgen.py:208-249).
# Resolution order everywhere: explicit path -> env var -> arp_tpu/assets/
# (vendor point) -> ~/.cache/arp_tpu -> opt-in download -> loud fallback.
ASSET_URLS = {
    "clip_bpe": (
        "bpe_simple_vocab_16e6.txt.gz",
        "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz",
    ),
    "bert_vocab": (
        "bert_base_uncased_vocab.txt",
        "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt",
    ),
}

# Directory users (or packagers) drop the assets into to make exact ids the
# zero-config default; see arp_tpu/assets/README.md.
ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "assets")


def resolve_asset(name: str, explicit: Optional[str] = None,
                  env_var: Optional[str] = None) -> Optional[str]:
    """Local path for a tokenizer asset, or None if absent everywhere.

    Never touches the network; ``fetch_asset`` is the explicit opt-in for
    that.  Checked in order: explicit arg, env var, the vendored
    ``arp_tpu/assets/`` dir, the download cache.
    """
    filename, _url = ASSET_URLS[name]
    candidates = [explicit]
    if env_var:
        candidates.append(os.environ.get(env_var))
    candidates.append(os.path.join(ASSETS_DIR, filename))
    cache = os.environ.get("ARP_TPU_CHECKPOINT_DIR", os.path.expanduser("~/.cache/arp_tpu"))
    candidates.append(os.path.join(cache, filename))
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def fetch_asset(
    name: str,
    download_dir: Optional[str] = None,
    allow_download: Optional[bool] = None,
    expected_sha256: Optional[str] = None,
    _urlopen=urllib.request.urlopen,
) -> str:
    """Download a tokenizer asset into the cache (explicit opt-in only).

    Unlike the model checkpoints, these URLs embed no digest; pass
    ``expected_sha256`` to pin one (recommended for production) — without a
    pin the download is trust-on-first-use and the sha256 is logged so the
    caller can record it.
    """
    filename, url = ASSET_URLS[name]
    download_dir = download_dir or os.environ.get(
        "ARP_TPU_CHECKPOINT_DIR", os.path.expanduser("~/.cache/arp_tpu")
    )
    target = os.path.join(download_dir, filename)
    if os.path.isfile(target):
        if expected_sha256 and sha256_of(target) != expected_sha256:
            raise RuntimeError(
                f"cached asset {target} has sha256 {sha256_of(target)}, "
                f"expected {expected_sha256}; delete it and retry")
        return target
    if not downloads_allowed(allow_download):
        raise PermissionError(
            f"asset {name} not found (looked in arp_tpu/assets/ and {download_dir}) "
            "and downloads are disabled (egress-free default). Place the file "
            f"manually or set ARP_TPU_ALLOW_DOWNLOAD=1 to fetch {url}.")
    os.makedirs(download_dir, exist_ok=True)
    fd, tmp_path = tempfile.mkstemp(dir=download_dir, suffix=".part")
    try:
        digest = hashlib.sha256()
        with os.fdopen(fd, "wb") as out, _urlopen(url) as resp:
            while chunk := resp.read(1 << 20):
                out.write(chunk)
                digest.update(chunk)
        if expected_sha256 and digest.hexdigest() != expected_sha256:
            raise RuntimeError(
                f"downloaded {url} has sha256 {digest.hexdigest()}, expected {expected_sha256}")
        os.replace(tmp_path, target)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
    return target


def expected_sha256(model_name: str) -> str:
    url = CHECKPOINT_URLS[model_name]
    return url.rsplit("/", 2)[-2]


def sha256_of(path: str, chunk_bytes: int = 1 << 20) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(chunk_bytes):
            digest.update(chunk)
    return digest.hexdigest()


def downloads_allowed(allow_download: Optional[bool] = None) -> bool:
    if allow_download is not None:
        return allow_download
    return os.environ.get("ARP_TPU_ALLOW_DOWNLOAD", "") == "1"


def fetch_checkpoint(
    model_name: str,
    download_dir: Optional[str] = None,
    allow_download: Optional[bool] = None,
    _urlopen=urllib.request.urlopen,
) -> str:
    """Return a verified local path to the model's torch checkpoint.

    A cached file is re-verified and reused; otherwise the checkpoint is
    downloaded (only with explicit opt-in), written atomically, and its
    sha256 checked against the URL-embedded digest before the path is
    returned.  Raises RuntimeError on digest mismatch (corrupt/tampered
    download) and PermissionError when downloads are not opted into.
    """
    if model_name not in CHECKPOINT_URLS:
        raise KeyError(f"no published checkpoint for {model_name!r}")
    url = CHECKPOINT_URLS[model_name]
    want = expected_sha256(model_name)
    download_dir = download_dir or os.environ.get(
        "ARP_TPU_CHECKPOINT_DIR", os.path.expanduser("~/.cache/arp_tpu")
    )
    target = os.path.join(download_dir, os.path.basename(url))

    if os.path.isfile(target):
        got = sha256_of(target)
        if got == want:
            return target
        raise RuntimeError(
            f"cached checkpoint {target} has sha256 {got}, expected {want}; "
            "delete it and retry"
        )

    if not downloads_allowed(allow_download):
        raise PermissionError(
            f"checkpoint {model_name} not cached at {target} and downloads are "
            "disabled (egress-free default). Pass allow_download=True or set "
            "ARP_TPU_ALLOW_DOWNLOAD=1 to fetch it from openaipublic.azureedge.net."
        )

    os.makedirs(download_dir, exist_ok=True)
    fd, tmp_path = tempfile.mkstemp(dir=download_dir, suffix=".part")
    try:
        digest = hashlib.sha256()
        with os.fdopen(fd, "wb") as out, _urlopen(url) as resp:
            while chunk := resp.read(1 << 20):
                out.write(chunk)
                digest.update(chunk)
        if digest.hexdigest() != want:
            raise RuntimeError(
                f"downloaded {url} has sha256 {digest.hexdigest()}, expected {want}"
            )
        os.replace(tmp_path, target)
    finally:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
    return target
