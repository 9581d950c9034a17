"""Weight resolution + auto-download (reference: sdfest/utils.py:10-43)."""
import hashlib
import os
import pathlib

import pytest

from sdfest_tpu.utils import weights


def _write_blob(path: pathlib.Path) -> str:
    data = b"fake-checkpoint-bytes" * 100
    path.write_bytes(data)
    return hashlib.sha256(data).hexdigest()


def test_download_weights_file_url_with_checksum(tmp_path):
    src = tmp_path / "remote.msgpack"
    digest = _write_blob(src)
    dst = tmp_path / "cache" / "weights.msgpack"
    out = weights.download_weights(src.as_uri(), str(dst), sha256=digest)
    assert out == str(dst)
    assert dst.read_bytes() == src.read_bytes()


def test_download_weights_checksum_mismatch_removes_file(tmp_path):
    src = tmp_path / "remote.msgpack"
    _write_blob(src)
    dst = tmp_path / "cache" / "weights.msgpack"
    with pytest.raises(IOError, match="Checksum mismatch"):
        weights.download_weights(src.as_uri(), str(dst), sha256="0" * 64)
    assert not dst.exists()
    assert not (tmp_path / "cache" / "weights.msgpack.part").exists()


def test_resolve_downloads_from_model_url(tmp_path, monkeypatch):
    src = tmp_path / "remote.pt"
    digest = _write_blob(src)
    # absolute target path: downloads land exactly there (no cache-dir remap)
    target = tmp_path / "local" / "weights.pt"
    cfg = {
        "model": str(target),
        "model_url": src.as_uri(),
        "model_sha256": digest,
    }
    resolved = weights._resolve_model_path(cfg)
    assert resolved == str(target)
    assert target.exists()


def test_resolve_no_download_env_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("SDFEST_TPU_NO_DOWNLOAD", "1")
    cfg = {
        "model": str(tmp_path / "missing.pt"),
        "model_url": "https://example.invalid/w.pt",
    }
    with pytest.raises(FileNotFoundError, match="Download it from"):
        weights._resolve_model_path(cfg)


def test_resolve_missing_without_url_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        weights._resolve_model_path({"model": str(tmp_path / "missing.pt")})
