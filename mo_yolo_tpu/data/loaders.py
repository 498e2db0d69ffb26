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

    def __init__(self, path: str, vid_stride: int = 1):
        import shutil
        if shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None:
            raise RuntimeError("video sources need an ffmpeg/ffprobe binary")
        self.path = str(path)
        # reference `vid_stride` (`data/loaders.py:205`): keep every k-th frame
        self.vid_stride = max(int(vid_stride), 1)
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
        return (self.n_frames + self.vid_stride - 1) // self.vid_stride

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
                if i % self.vid_stride == 0:
                    frame = np.frombuffer(buf, np.uint8).reshape(
                        self.h, self.w, 3)
                    yield f"{self.path}#{i:06d}", frame
                i += 1
        finally:
            proc.stdout.close()
            proc.wait()


STREAM_PREFIXES = ("rtsp://", "rtmp://", "http://", "https://", "tcp://",
                   "udp://")


class StreamSource:
    """Live stream (RTSP/RTMP/HTTP) or webcam device, decoded through a
    threaded ffmpeg rawvideo pipe — the reference's `LoadStreams`
    (`data/loaders.py:31-120`: cv2.VideoCapture + reader thread). Keeps
    only the LATEST frame (the reference's unbuffered mode): inference
    always sees the freshest frame and slow consumers drop, not lag.

    Webcams are integer indexes ("0") mapped to /dev/video<N> via the
    v4l2 demuxer. Iteration ends when the stream does, or after
    `max_frames`, or on `stop()`."""

    def __init__(self, source: Union[str, int], max_frames: int = 0,
                 fps_probe: Tuple[int, int] = (640, 480)):
        import shutil
        self.src = str(source)
        self.max_frames = max_frames
        self._stop = False
        if str(source).isdigit():
            self._cmd = ["ffmpeg", "-v", "error", "-f", "v4l2",
                         "-i", f"/dev/video{source}"]
            self.w, self.h = fps_probe
        else:
            if shutil.which("ffprobe") is None:
                raise RuntimeError("stream sources need ffmpeg/ffprobe")
            import json
            import subprocess
            probe = subprocess.run(
                ["ffprobe", "-v", "error", "-select_streams", "v:0",
                 "-show_entries", "stream=width,height", "-of", "json",
                 self.src], capture_output=True, check=True)
            st = json.loads(probe.stdout)["streams"][0]
            self.w, self.h = int(st["width"]), int(st["height"])
            self._cmd = ["ffmpeg", "-v", "error", "-i", self.src]
        if shutil.which("ffmpeg") is None:
            raise RuntimeError("stream sources need an ffmpeg binary")

    def _open_pipe(self):
        import subprocess
        return subprocess.Popen(
            self._cmd + ["-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
            stdout=subprocess.PIPE, bufsize=self.w * self.h * 3 * 4).stdout

    def stop(self):
        self._stop = True

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        import queue
        import threading

        pipe = self._open_pipe()
        latest: "queue.Queue" = queue.Queue(maxsize=1)
        nbytes = self.w * self.h * 3

        def reader():
            while not self._stop:
                buf = pipe.read(nbytes)
                if len(buf) < nbytes:
                    break
                frame = np.frombuffer(buf, np.uint8).reshape(
                    self.h, self.w, 3)
                try:               # drop the stale frame, keep the new one
                    latest.get_nowait()
                except queue.Empty:
                    pass
                latest.put(frame)
            latest.put(None)       # sentinel: end of stream

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        i = 0
        try:
            while not self._stop:
                frame = latest.get()
                if frame is None:
                    break
                yield f"{self.src}#{i:06d}", frame
                i += 1
                if self.max_frames and i >= self.max_frames:
                    break
        finally:
            self._stop = True
            pipe.close()


class ScreenshotSource:
    """Screen-capture frames (reference `LoadScreenshots`,
    `loaders.py:123-152`: mss-based). Gated on the `mss` package; screen
    geometry is (monitor, left, top, width, height) like the reference's
    `screen 0 100 100 512 256` source syntax."""

    def __init__(self, spec: str = "screen", max_frames: int = 0):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "screenshot sources need the `mss` package") from e
        parts = str(spec).split()
        self.monitor = int(parts[1]) if len(parts) > 1 else 0
        self.region = [int(p) for p in parts[2:6]] if len(parts) >= 6 else None
        self.max_frames = max_frames

    def __iter__(self) -> Iterator[Tuple[str, np.ndarray]]:
        import mss

        with mss.mss() as sct:
            mon = sct.monitors[self.monitor]
            if self.region:
                left, top, w, h = self.region
                mon = {"left": mon["left"] + left, "top": mon["top"] + top,
                       "width": w, "height": h}
            i = 0
            while not self.max_frames or i < self.max_frames:
                shot = np.asarray(sct.grab(mon))[..., :3][..., ::-1]  # BGRA->RGB
                yield f"screen_{i:06d}", np.ascontiguousarray(shot)
                i += 1


class TensorSource:
    """Pre-decoded tensors (reference `LoadTensor`, `loaders.py:280-307`):
    torch/jax/numpy [B,C,H,W] or [B,H,W,C], float in [0,1] or uint8 —
    normalized to HWC uint8 RGB frames."""

    def __init__(self, tensor):
        x = np.asarray(tensor)
        if x.ndim == 3:
            x = x[None]
        if x.ndim != 4:
            raise ValueError(f"tensor source must be 3D/4D, got {x.shape}")
        if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
            x = np.moveaxis(x, 1, -1)          # BCHW -> BHWC
        if x.dtype != np.uint8:
            x = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, axis=-1)
        self.frames = x

    def __len__(self):
        return len(self.frames)

    def __iter__(self):
        for i, f in enumerate(self.frames):
            yield f"tensor_{i:06d}", f


def make_source(source, vid_stride: int = 1,
                ) -> Union["ImageFolderSource", "ArraySource",
                           "VideoSource", "StreamSource",
                           "TensorSource"]:
    """Source sniffing (reference `data/build.py:201-224`): directory /
    glob / txt list / image file / video file / URL stream / webcam index
    / list of paths / ndarray stack / list of arrays or PIL images /
    single PIL image / torch-jax tensor. `vid_stride` keeps every k-th
    frame of video files (reference `vid_stride`)."""
    if isinstance(source, int):
        return StreamSource(source)
    if isinstance(source, (str, Path)):
        s = str(source)
        if s.isdigit():
            return StreamSource(s)
        if s == "screen" or s.startswith("screen "):
            return ScreenshotSource(s)
        if s.lower().startswith(STREAM_PREFIXES):
            return StreamSource(s)
        if Path(source).suffix.lower() in VID_EXTS:
            return VideoSource(s, vid_stride=vid_stride)
        return ImageFolderSource(source)
    # torch / jax tensors (duck-typed: anything array-like that is not a
    # numpy array or PIL image)
    if type(source).__module__.startswith(("torch", "jax")):
        return TensorSource(source)
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
