"""Host-side image preprocessing (letterbox resize + normalize).

Equivalent of the reference `LetterBox` transform (`data/augment.py:540-585`)
and the track predictor's scaleFill variant (`predict.py:96-105`), in numpy
(PIL for resampling — cv2 is not available in this environment). The device
side consumes float32/bf16 NHWC in [0, 1].
"""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
from PIL import Image

ImgSize = Union[int, str, Tuple[int, int]]


def to_hw(imgsz: ImgSize) -> Tuple[int, int]:
    """Canonicalize an image-size spec to (H, W).

    Accepts an int (square, the common case), an (h, w) sequence
    (reference rect-style `imgsz=[h,w]`), or a "WxH" string (the bench
    convention, e.g. "1536x800" = W 1536, H 800)."""
    if isinstance(imgsz, str):
        if "x" in imgsz:
            w, h = (int(v) for v in imgsz.split("x"))
            return h, w
        return int(imgsz), int(imgsz)
    if isinstance(imgsz, (tuple, list)):
        h, w = imgsz
        return int(h), int(w)
    return int(imgsz), int(imgsz)


def rect_hw(orig_h: int, orig_w: int, imgsz: ImgSize,
            stride: int = 32) -> Tuple[int, int]:
    """Derive the reference's `rect=True` input shape: scale the source
    aspect so the long side is `imgsz`, then snap each side UP to the
    stride multiple (reference LetterBox `auto=True` minimum-rectangle
    padding, `data/augment.py:540-585`). Static per source — one compile."""
    h, w = to_hw(imgsz)
    size = max(h, w)
    g = size / max(orig_h, orig_w)
    rh = int(np.ceil(orig_h * g / stride) * stride)
    rw = int(np.ceil(orig_w * g / stride) * stride)
    return min(rh, size), min(rw, size)


def letterbox(img: np.ndarray, new_shape: Tuple[int, int] = (640, 640),
              scale_fill: bool = False, scaleup: bool = True,
              pad_value: int = 114):
    """img: HWC uint8 RGB. Returns (out HWC uint8, gain, (pad_x, pad_y)).

    scale_fill=True stretches without preserving aspect (the reference track
    predictor uses scaleFill, `predict.py:96-105`).
    """
    h, w = img.shape[:2]
    nh, nw = new_shape
    if scale_fill:
        out = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))
        return out, (nw / w, nh / h), (0.0, 0.0)
    gain = min(nh / h, nw / w)
    if not scaleup:
        gain = min(gain, 1.0)
    uw, uh = round(w * gain), round(h * gain)
    resized = np.asarray(Image.fromarray(img).resize((uw, uh), Image.BILINEAR))
    out = np.full((nh, nw, img.shape[2]), pad_value, img.dtype)
    px, py = (nw - uw) // 2, (nh - uh) // 2
    out[py:py + uh, px:px + uw] = resized
    return out, (gain, gain), (px, py)


def preprocess(img: np.ndarray, size: ImgSize = 640,
               scale_fill: bool = True) -> Tuple[np.ndarray, dict]:
    """uint8 HWC RGB -> float32 [1,H,W,3] in [0,1] + meta for box rescale.
    `size` may be an int (square) or (h, w) for rect inference."""
    hw = to_hw(size)
    out, gain, pad = letterbox(img, hw, scale_fill=scale_fill)
    x = out.astype(np.float32) / 255.0
    meta = {"orig_shape": img.shape[:2], "gain": gain, "pad": pad,
            "input_shape": hw, "scale_fill": scale_fill}
    return x[None], meta


def boxes_to_original(boxes_xyxy: np.ndarray, meta: dict) -> np.ndarray:
    """Map xyxy boxes from model-input pixels back to original image pixels."""
    oh, ow = meta["orig_shape"]
    if meta["scale_fill"]:
        gx, gy = meta["gain"]
        out = boxes_xyxy / np.array([gx, gy, gx, gy])
    else:
        g = meta["gain"][0]
        px, py = meta["pad"]
        out = (boxes_xyxy - np.array([px, py, px, py])) / g
    out[..., [0, 2]] = np.clip(out[..., [0, 2]], 0, ow)
    out[..., [1, 3]] = np.clip(out[..., [1, 3]], 0, oh)
    return out
