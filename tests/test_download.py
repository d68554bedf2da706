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
