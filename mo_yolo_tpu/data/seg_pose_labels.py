"""Segmentation-polygon and pose-keypoint label parsing.

The reference's label formats (`data/utils.py verify_image_label` +
`utils/instance.py`):
  seg row:  `cls x1 y1 x2 y2 x3 y3 ...`       (normalized polygon, >=3 pts)
  pose row: `cls cx cy w h px1 py1 v1 ... pxK pyK vK`  (normalized)
Masks are rasterized host-side with PIL at a caller-chosen resolution
(the reference downsamples to proto resolution too, `val.py process`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def parse_seg_label(path: str) -> Tuple[np.ndarray, list]:
    """-> (cls [N], polygons list of [M,2] normalized arrays)."""
    cls, polys = [], []
    try:
        rows = open(path).read().strip().splitlines()
    except OSError:
        return np.zeros(0, np.int32), []
    for row in rows:
        v = row.split()
        if len(v) < 7 or (len(v) - 1) % 2:
            continue
        cls.append(int(float(v[0])))
        polys.append(np.asarray(v[1:], np.float32).reshape(-1, 2))
    return np.asarray(cls, np.int32), polys


def polygons_to_boxes(polys) -> np.ndarray:
    """Normalized polygons -> xyxy normalized boxes [N,4]."""
    if not polys:
        return np.zeros((0, 4), np.float32)
    return np.stack([
        np.array([p[:, 0].min(), p[:, 1].min(), p[:, 0].max(),
                  p[:, 1].max()], np.float32) for p in polys])


def rasterize_polygons(polys, size: int) -> np.ndarray:
    """Normalized polygons -> [N, size, size] bool masks."""
    from PIL import Image, ImageDraw

    out = np.zeros((len(polys), size, size), bool)
    for i, p in enumerate(polys):
        img = Image.new("L", (size, size), 0)
        ImageDraw.Draw(img).polygon(
            [(float(x * size), float(y * size)) for x, y in p],
            outline=1, fill=1)
        out[i] = np.asarray(img, bool)
    return out


def parse_pose_label(path: str, n_kpt: int) -> Tuple[np.ndarray, np.ndarray,
                                                     np.ndarray]:
    """-> (cls [N], boxes cxcywh normalized [N,4],
    kpts [N,K,3] normalized xy + vis)."""
    cls, boxes, kpts = [], [], []
    want = 5 + 3 * n_kpt
    try:
        rows = open(path).read().strip().splitlines()
    except OSError:
        rows = []
    for row in rows:
        v = row.split()
        if len(v) != want:
            continue
        cls.append(int(float(v[0])))
        boxes.append(np.asarray(v[1:5], np.float32))
        kpts.append(np.asarray(v[5:], np.float32).reshape(n_kpt, 3))
    if not cls:
        return (np.zeros(0, np.int32), np.zeros((0, 4), np.float32),
                np.zeros((0, n_kpt, 3), np.float32))
    return (np.asarray(cls, np.int32), np.stack(boxes), np.stack(kpts))
