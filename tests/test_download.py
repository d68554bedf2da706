"""Guarded sha256-verified checkpoint download path (no real network IO)."""

import hashlib
import io

import pytest

from arp_tpu.models.clip import download as dl


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_urlopen_for(payload: bytes):
    def _urlopen(url):
        return _FakeResponse(payload)

    return _urlopen


def test_refuses_without_opt_in(tmp_path, monkeypatch):
    monkeypatch.delenv("ARP_TPU_ALLOW_DOWNLOAD", raising=False)
    with pytest.raises(PermissionError, match="disabled"):
        dl.fetch_checkpoint("vit_b16", download_dir=str(tmp_path))


def test_download_verifies_sha256(tmp_path, monkeypatch):
    payload = b"definitely a torch checkpoint"
    digest = hashlib.sha256(payload).hexdigest()
    monkeypatch.setitem(
        dl.CHECKPOINT_URLS, "vit_b16", f"https://example.test/clip/models/{digest}/ViT-B-16.pt"
    )
    path = dl.fetch_checkpoint(
        "vit_b16",
        download_dir=str(tmp_path),
        allow_download=True,
        _urlopen=_fake_urlopen_for(payload),
    )
    assert open(path, "rb").read() == payload
    # cached file is reused without network
    again = dl.fetch_checkpoint("vit_b16", download_dir=str(tmp_path), _urlopen=None)
    assert again == path


def test_download_rejects_corrupt_payload(tmp_path, monkeypatch):
    good = hashlib.sha256(b"expected bytes").hexdigest()
    monkeypatch.setitem(
        dl.CHECKPOINT_URLS, "vit_b16", f"https://example.test/clip/models/{good}/ViT-B-16.pt"
    )
    with pytest.raises(RuntimeError, match="sha256"):
        dl.fetch_checkpoint(
            "vit_b16",
            download_dir=str(tmp_path),
            allow_download=True,
            _urlopen=_fake_urlopen_for(b"tampered bytes"),
        )
    # no partial file left behind
    assert not any(p.name.endswith(".part") for p in tmp_path.iterdir())


def test_corrupt_cache_detected(tmp_path, monkeypatch):
    good = hashlib.sha256(b"expected").hexdigest()
    monkeypatch.setitem(
        dl.CHECKPOINT_URLS, "vit_b16", f"https://example.test/clip/models/{good}/ViT-B-16.pt"
    )
    (tmp_path / "ViT-B-16.pt").write_bytes(b"rotten")
    with pytest.raises(RuntimeError, match="delete it"):
        dl.fetch_checkpoint("vit_b16", download_dir=str(tmp_path), allow_download=True)


def test_every_model_has_url_and_digest():
    from arp_tpu.models.clip.model import MODELS

    for name in MODELS:
        assert name in dl.CHECKPOINT_URLS, name
        assert len(dl.expected_sha256(name)) == 64, name


# --- tokenizer assets (VERDICT r3 missing #2: zero-config exact ids) ----------


def test_asset_refuses_without_opt_in(tmp_path, monkeypatch):
    monkeypatch.delenv("ARP_TPU_ALLOW_DOWNLOAD", raising=False)
    monkeypatch.setattr(dl, "ASSETS_DIR", str(tmp_path / "none"))
    with pytest.raises(PermissionError, match="disabled"):
        dl.fetch_asset("clip_bpe", download_dir=str(tmp_path))


def test_asset_fetch_and_resolution_order(tmp_path, monkeypatch):
    payload = b"merges file bytes"
    got = dl.fetch_asset("clip_bpe", download_dir=str(tmp_path),
                         allow_download=True,
                         expected_sha256=hashlib.sha256(payload).hexdigest(),
                         _urlopen=_fake_urlopen_for(payload))
    assert open(got, "rb").read() == payload

    # cache hit resolves without network
    monkeypatch.setenv("ARP_TPU_CHECKPOINT_DIR", str(tmp_path))
    monkeypatch.setattr(dl, "ASSETS_DIR", str(tmp_path / "no-assets"))
    assert dl.resolve_asset("clip_bpe") == got

    # vendored assets dir wins over the cache
    assets = tmp_path / "assets"
    assets.mkdir()
    vendored = assets / dl.ASSET_URLS["clip_bpe"][0]
    vendored.write_bytes(payload)
    monkeypatch.setattr(dl, "ASSETS_DIR", str(assets))
    assert dl.resolve_asset("clip_bpe") == str(vendored)

    # env var wins over vendored
    monkeypatch.setenv("ARP_TPU_BPE_PATH", got)
    assert dl.resolve_asset("clip_bpe", env_var="ARP_TPU_BPE_PATH") == got

    # explicit path wins over everything
    explicit = tmp_path / "explicit.txt.gz"
    explicit.write_bytes(payload)
    assert dl.resolve_asset("clip_bpe", explicit=str(explicit),
                            env_var="ARP_TPU_BPE_PATH") == str(explicit)


def test_asset_sha_mismatch_rejected(tmp_path):
    with pytest.raises(RuntimeError, match="sha256"):
        dl.fetch_asset("bert_vocab", download_dir=str(tmp_path),
                       allow_download=True, expected_sha256="0" * 64,
                       _urlopen=_fake_urlopen_for(b"wrong bytes"))
    assert not (tmp_path / dl.ASSET_URLS["bert_vocab"][0]).exists()


def test_build_tokenizer_picks_up_vendored_asset(tmp_path, monkeypatch):
    """A merges file dropped in arp_tpu/assets/ becomes the zero-config
    default (no env vars) — exact ids instead of the fallback vocab."""
    import gzip

    from arp_tpu.models.clip import tokenizer as tk

    # minimal-but-valid merges file: header + enough pairs to parse
    merges = "version: bpe\nt h\nth e</w>\n"
    path = tmp_path / dl.ASSET_URLS["clip_bpe"][0]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(merges)
    monkeypatch.delenv("ARP_TPU_BPE_PATH", raising=False)
    monkeypatch.setattr(dl, "ASSETS_DIR", str(tmp_path))
    fn = tk.build_tokenizer()
    assert not fn.tokenizer.using_fallback_vocab
    assert fn.tokenizer.identity.startswith("bpe:")
