"""Asset fetching (reference `utils/downloads.py`): local / file:// /
zip handling, disk-space gate, and the offline http error contract."""

import zipfile
from pathlib import Path

import pytest

from mo_yolo_tpu.utils.downloads import (check_disk_space, download,
                                         is_url, safe_download, unzip_file)


def test_is_url(tmp_path):
    assert is_url("https://example.com/w.pt")
    assert is_url("file:///tmp/x.pt")
    assert not is_url("/plain/local/path.pt")
    assert not is_url("not a url")
    f = tmp_path / "a.bin"
    f.write_bytes(b"x")
    assert is_url(f"file://{f}", check=True)
    assert not is_url("file:///nonexistent/definitely.bin", check=True)


def test_safe_download_local_and_fileurl(tmp_path):
    src = tmp_path / "weights.pt"
    src.write_bytes(b"W" * 64)
    out = safe_download(str(src), dir=str(tmp_path / "d1"))
    assert out.read_bytes() == src.read_bytes()
    out2 = safe_download(f"file://{src}", file=str(tmp_path / "d2/w.pt"))
    assert out2 == tmp_path / "d2/w.pt" and out2.exists()
    with pytest.raises(FileNotFoundError):
        safe_download(str(tmp_path / "missing.pt"), dir=str(tmp_path))


def test_safe_download_zip_roundtrip(tmp_path):
    zp = tmp_path / "data.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("images/0.txt", "a")
        z.writestr("labels/0.txt", "b")
    root = safe_download(str(zp), dir=str(tmp_path / "out"))
    assert root == tmp_path / "out" / "data"
    assert (root / "images/0.txt").read_text() == "a"
    # re-download with exist_ok default: unzip skipped, same root
    assert safe_download(str(zp), dir=str(tmp_path / "out")) == root


def test_unzip_single_root_dir(tmp_path):
    zp = tmp_path / "ds.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("ds/", "")
        z.writestr("ds/x.txt", "x")
    root = unzip_file(zp, path=str(tmp_path / "o"))
    assert root == tmp_path / "o" / "ds"
    assert (root / "x.txt").read_text() == "x"


def test_http_offline_error(tmp_path):
    with pytest.raises(ConnectionError, match="no.*egress|cannot download"):
        safe_download("https://127.0.0.1:9/weights.pt",
                      dir=str(tmp_path))


def test_check_disk_space_and_batch(tmp_path):
    assert check_disk_space(1)                      # 1 byte always fits
    with pytest.raises(OSError):
        check_disk_space(1 << 60)                   # an exabyte never
    assert check_disk_space(1 << 60, hard=False) is False
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("1")
    b.write_text("2")
    outs = download([str(a), str(b)], dir=tmp_path / "batch")
    assert [o.name for o in outs] == ["a.txt", "b.txt"]
