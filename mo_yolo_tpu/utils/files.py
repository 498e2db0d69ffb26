"""Filesystem helpers (reference `ultralytics/utils/files.py`)."""
from __future__ import annotations

import os
import time
from pathlib import Path


def increment_path(path, exist_ok: bool = False, sep: str = "",
                   mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... when the path exists
    (reference `files.py:28-57`): the CLI's `project`/`name`/`exist_ok`
    semantics — never overwrite an earlier run unless exist_ok=True.
    File paths keep their extension; mkdir=True creates the result."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = ((path.with_suffix(""), path.suffix)
                        if path.is_file() else (path, ""))
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path) -> float:
    """Days since last modification (reference `files.py:60-64`)."""
    return (time.time() - Path(path).stat().st_mtime) / 86400.0


def file_size(path) -> float:
    """Size in MB; directories recurse (reference `files.py:75-84`)."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*")
                   if f.is_file()) / mb
    return 0.0
