"""Asset fetching (reference `ultralytics/utils/downloads.py`).

A TPU production deployment stages weights/datasets on shared storage
(NFS / GCS-fuse), so the primary sources here are local paths and
`file://` URLs — both fully supported and tested. `http(s)://` uses
urllib when the environment has egress and raises a precise
ConnectionError naming the URL when it does not (this offline image),
instead of the reference's silent retry loop.
"""
from __future__ import annotations

import shutil
import urllib.parse
import urllib.request
import zipfile
from pathlib import Path
from typing import Optional, Sequence

from mo_yolo_tpu.utils.logging import LOGGER


def is_url(url, check: bool = False) -> bool:
    """Syntactic URL test (reference `downloads.py:29-39`); check=True
    additionally opens it (never for file:// — existence is enough)."""
    try:
        url = str(url)
        r = urllib.parse.urlparse(url)
        ok = all([r.scheme, r.netloc or r.scheme == "file"])
        if not ok:
            return False
        if check:
            if r.scheme == "file":
                return Path(urllib.request.url2pathname(r.path)).exists()
            with urllib.request.urlopen(url) as resp:  # pragma: no cover
                return resp.getcode() == 200
        return True
    except Exception:
        return False


def unzip_file(file, path: Optional[str] = None,
               exclude: Sequence[str] = (".DS_Store", "__MACOSX"),
               exist_ok: bool = False) -> Path:
    """Unzip into path/<stem> unless the archive already carries a single
    top-level directory (reference `downloads.py:42-85`)."""
    file = Path(file)
    path = Path(path or file.parent)
    with zipfile.ZipFile(file) as z:
        names = [n for n in z.namelist()
                 if not any(x in n for x in exclude)]
        tops = {n.split("/")[0] for n in names}
        if len(tops) == 1 and list(z.namelist())[0].endswith("/"):
            out = path          # archive has its own single root dir
            root = path / next(iter(tops))
        else:
            out = path / file.stem
            root = out
        if root.exists() and any(root.iterdir()) and not exist_ok:
            LOGGER.info(f"{root} already exists, skipping unzip")
            return root
        for n in names:
            z.extract(n, out)
    return root


def check_disk_space(need_bytes: int, path: str = ".", sf: float = 1.5,
                     hard: bool = True) -> bool:
    """Free-space gate with safety factor (reference `downloads.py:88`)."""
    free = shutil.disk_usage(path).free
    if free >= need_bytes * sf:
        return True
    msg = (f"insufficient disk space: need {need_bytes * sf / 1e9:.1f} GB "
           f"(x{sf} safety), free {free / 1e9:.1f} GB")
    if hard:
        raise OSError(msg)
    LOGGER.warning(msg)
    return False


def safe_download(url, file=None, dir=None, unzip: bool = True,
                  delete: bool = False, exist_ok: bool = False) -> Path:
    """Fetch url (local path / file:// / http(s)://) to file-or-dir,
    optionally unzipping .zip artifacts (reference `downloads.py:120`).
    Returns the final path (the unzip root for archives)."""
    url = str(url)
    r = urllib.parse.urlparse(url)
    if r.scheme == "file":
        src = Path(urllib.request.url2pathname(r.path))
    elif r.scheme in ("http", "https"):
        src = None
    else:
        src = Path(url)         # bare local path
    name = (src.name if src is not None
            else Path(urllib.parse.unquote(r.path)).name)
    dest = Path(file) if file else Path(dir or ".") / name
    dest.parent.mkdir(parents=True, exist_ok=True)

    if src is not None:
        if not src.exists():
            raise FileNotFoundError(f"{url} -> {src} does not exist")
        if src.resolve() != dest.resolve():
            check_disk_space(src.stat().st_size, str(dest.parent))
            shutil.copy2(src, dest)
    else:
        try:
            with urllib.request.urlopen(url, timeout=30) as resp:
                check_disk_space(int(resp.headers.get("Content-Length", 0)
                                     or 0), str(dest.parent))
                with open(dest, "wb") as f:
                    shutil.copyfileobj(resp, f)
        except OSError as e:
            raise ConnectionError(
                f"cannot download {url!r}: {e}. This environment has no "
                f"network egress — stage the asset on shared storage and "
                f"pass a local path or file:// URL instead.") from e

    if unzip and dest.suffix == ".zip":
        root = unzip_file(dest, exist_ok=exist_ok)
        if delete:
            dest.unlink()
        return root
    return dest


def download(url, dir=Path.cwd(), unzip: bool = True, delete: bool = False,
             threads: int = 1, **kw) -> list:
    """Batch front-end (reference `downloads.py:257`): sequential here —
    local copies are IO-bound on one core; `threads` accepted for
    signature parity."""
    urls = [url] if isinstance(url, (str, Path)) else list(url)
    return [safe_download(u, dir=dir, unzip=unzip, delete=delete, **kw)
            for u in urls]
