"""ctypes binding for the native threaded frame loader (native/frameloader.cpp).

Auto-builds the shared library with g++ on first use (no pybind11 in this
image; plain C ABI + ctypes). Falls back cleanly when the toolchain or
libjpeg/libpng are unavailable — callers check `available()`.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterator, List, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libframeloader.so"
_SRC = _DIR.parent.parent / "native" / "frameloader.cpp"
_lib = None


def _build() -> bool:
    if not _SRC.is_file():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", str(_SO), str(_SRC), "-ljpeg", "-lpng", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    """True when frameloader.cpp is newer than the built .so — edits to the
    source must trigger a rebuild instead of silently using the old binary."""
    try:
        return _SRC.is_file() and _SRC.stat().st_mtime > _SO.stat().st_mtime
    except OSError:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not _SO.is_file() or _stale()) and not _build():
        if not _SO.is_file():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeFrameLoader:
    """Iterates (path, float32 [H,W,3] in [0,1], (orig_h, orig_w)) with
    decode+letterbox done by C++ worker threads ahead of consumption."""

    def __init__(self, paths: List[str], out_h: int, out_w: int,
                 n_threads: int = 2, scale_fill: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frameloader unavailable")
        self._lib = lib
        self.paths = [p for p in paths
                      if p.lower().endswith((".jpg", ".jpeg", ".png"))]
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self.out_h, self.out_w = out_h, out_w
        self._h = lib.fl_create(arr, len(self.paths), out_h, out_w,
                                n_threads, int(scale_fill))
        self._buf = np.empty((out_h, out_w, 3), np.float32)

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray, Tuple[int, int]]]:
        oh = ctypes.c_int()
        ow = ctypes.c_int()
        for p in self.paths:
            rc = self._lib.fl_next(
                self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(oh), ctypes.byref(ow))
            if rc < 0:
                return
            if rc == 0:
                continue  # decode failure: skip (reference logs + skips)
            yield p, self._buf.copy(), (oh.value, ow.value)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.fl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def iter_frames(paths: List[str]):
    """Loader-compat shim returning (path, uint8 HWC) — used by
    data/loaders.py when decode-only is wanted."""
    # decode-only path still goes through PIL; the native loader's value is
    # the fused decode+letterbox+normalize used by the predictor
    from mo_yolo_tpu.data.loaders import load_image
    for p in paths:
        yield p, load_image(p)
