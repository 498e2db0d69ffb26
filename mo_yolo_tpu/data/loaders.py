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
VID_EXTS = {".asf", ".avi", ".gif", ".m4v", ".mkv", ".mov", ".mp4",
            ".mpeg", ".mpg", ".ts", ".webm", ".wmv"}


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
    """Sequential frame iterator over a directory / glob / list file /
    explicit path list."""

    def __init__(self, source, prefetch: int = 2, use_native: bool = True):
        if isinstance(source, (list, tuple)):
            self.files = [str(f) for f in source]
        else:
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


class VideoSource:
    """Video-file frames decoded through an ffmpeg rawvideo pipe (the
    environment has no cv2; reference uses `cv2.VideoCapture`,
    `data/loaders.py:155-230`). Gated on an ffmpeg binary being present."""

    def __init__(self, path: str):
        import shutil
        if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
            raise RuntimeError("video sources need an ffmpeg/ffprobe binary")
        self.path = str(path)
        import json
        import subprocess
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "v:0",
             "-show_entries", "stream=width,height,nb_frames",
             "-of", "json", self.path],
            capture_output=True, check=True)
        st = json.loads(probe.stdout)["streams"][0]
        self.w, self.h = int(st["width"]), int(st["height"])
        self.n_frames = int(st.get("nb_frames") or 0)

    def __len__(self):
        return self.n_frames

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        import subprocess
        proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-i", self.path, "-f", "rawvideo",
             "-pix_fmt", "rgb24", "-"],
            stdout=subprocess.PIPE, bufsize=self.w * self.h * 3 * 4)
        try:
            i = 0
            nbytes = self.w * self.h * 3
            while True:
                buf = proc.stdout.read(nbytes)
                if len(buf) < nbytes:
                    break
                frame = np.frombuffer(buf, np.uint8).reshape(self.h, self.w, 3)
                yield f"{self.path}#{i:06d}", frame
                i += 1
        finally:
            proc.stdout.close()
            proc.wait()


def make_source(source) -> Union["ImageFolderSource", "ArraySource",
                                 "VideoSource"]:
    """Source sniffing (reference `data/build.py:201-224`): directory /
    glob / txt list / image file / video file / list of paths / ndarray
    stack / list of arrays or PIL images / single PIL image."""
    if isinstance(source, (str, Path)):
        if Path(source).suffix.lower() in VID_EXTS:
            return VideoSource(str(source))
        return ImageFolderSource(source)
    if isinstance(source, np.ndarray):
        return ArraySource(source if source.ndim == 4 else source[None])
    if isinstance(source, Image.Image):
        return ArraySource([np.asarray(source.convert("RGB"))])
    if isinstance(source, (list, tuple)) and len(source):
        if isinstance(source[0], np.ndarray):
            return ArraySource(source)
        if isinstance(source[0], Image.Image):
            return ArraySource([np.asarray(im.convert("RGB"))
                                for im in source])
        if isinstance(source[0], (str, Path)):
            return ImageFolderSource(source)
    raise TypeError(f"unsupported source type: {type(source)}")
