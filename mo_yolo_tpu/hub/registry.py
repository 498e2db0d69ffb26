"""Artifact registry — the model-zoo half of the reference HUB.

Backends: a local directory (default `~/.mo_yolo_tpu/registry`, override
via MO_YOLO_REGISTRY) or any `file://` URL (shared filesystem mounts —
the realistic distribution channel inside a TPU pod). Artifacts are
files OR directories (orbax checkpoints are directories); integrity is a
sha256 over the file tree recorded in `index.json`.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from pathlib import Path
from typing import Dict, Optional


def _tree_sha256(path: Path) -> str:
    h = hashlib.sha256()
    if path.is_file():
        h.update(path.read_bytes())
    else:
        for p in sorted(path.rglob("*")):
            if p.is_file():
                h.update(str(p.relative_to(path)).encode())
                h.update(p.read_bytes())
    return h.hexdigest()


class Registry:
    def __init__(self, root: Optional[str] = None):
        root = root or os.environ.get(
            "MO_YOLO_REGISTRY", str(Path.home() / ".mo_yolo_tpu" / "registry"))
        if str(root).startswith("file://"):
            root = str(root)[len("file://"):]
        elif "://" in str(root):
            raise ValueError(
                f"unsupported registry URL {root!r}: only local paths / "
                "file:// are available in an air-gapped TPU deployment")
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.index_file = self.root / "index.json"

    # ---------------------------------------------------------------- #
    def _index(self) -> Dict[str, dict]:
        try:
            return json.loads(self.index_file.read_text())
        except (OSError, ValueError):
            return {}

    def _write_index(self, idx: Dict[str, dict]):
        self.index_file.write_text(json.dumps(idx, indent=2))

    def list(self) -> Dict[str, dict]:
        return self._index()

    def push(self, name: str, path: str) -> str:
        """Copy a file/directory into the registry under `name`."""
        src = Path(path)
        if not src.exists():
            raise FileNotFoundError(path)
        dst = self.root / name
        if dst.exists():
            shutil.rmtree(dst) if dst.is_dir() else dst.unlink()
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
        idx = self._index()
        idx[name] = {"sha256": _tree_sha256(dst),
                     "bytes": sum(p.stat().st_size for p in
                                  ([dst] if dst.is_file()
                                   else dst.rglob("*")) if p.is_file())}
        self._write_index(idx)
        return str(dst)

    def pull(self, name: str, dest: Optional[str] = None,
             verify: bool = True) -> Path:
        """Resolve (and optionally copy out) an artifact, checking its
        recorded sha256 — a corrupted model must fail loudly, not load."""
        src = self.root / name
        if not src.exists():
            raise FileNotFoundError(f"{name!r} not in registry "
                                    f"({self.root}); have: "
                                    f"{sorted(self._index())}")
        if verify:
            want = self._index().get(name, {}).get("sha256")
            got = _tree_sha256(src)
            if want is not None and want != got:
                raise IOError(f"registry artifact {name!r} failed sha256 "
                              f"verification ({got[:12]} != {want[:12]})")
        if dest is None:
            return src
        dst = Path(dest)
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src, dst)
        return dst

    def delete(self, name: str):
        dst = self.root / name
        if dst.exists():
            shutil.rmtree(dst) if dst.is_dir() else dst.unlink()
        idx = self._index()
        idx.pop(name, None)
        self._write_index(idx)
