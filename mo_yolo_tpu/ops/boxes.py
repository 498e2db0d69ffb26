"""Batched box operations (jittable, TPU-friendly).

Covers the semantics of the reference's box utilities
(`ultralytics/utils/ops.py`, `ultralytics/utils/metrics.py:bbox_iou`,
`MOTR/util/box_ops.py`, `MOTR/models/structures/boxes.py`) as pure
vectorized jnp functions. All functions accept arbitrary leading batch
dimensions; boxes are float arrays whose last axis is 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def xywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(b: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def elementwise_iou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True,
                    giou: bool = False, eps: float = EPS) -> jnp.ndarray:
    """IoU / GIoU of aligned box pairs; mirrors the reference `bbox_iou`
    (`ultralytics/utils/metrics.py`) used by the loss and matcher.

    box1, box2: [..., 4]. Returns [...] (no trailing singleton dim).
    """
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = box_area(box1) + box_area(box2) - inter + eps
    iou = inter / union
    if not giou:
        return iou
    # smallest enclosing box
    cx1 = jnp.minimum(box1[..., 0], box2[..., 0])
    cy1 = jnp.minimum(box1[..., 1], box2[..., 1])
    cx2 = jnp.maximum(box1[..., 2], box2[..., 2])
    cy2 = jnp.maximum(box1[..., 3], box2[..., 3])
    c_area = (cx2 - cx1) * (cy2 - cy1) + eps
    return iou - (c_area - union) / c_area


def elementwise_ciou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True,
                     eps: float = EPS) -> jnp.ndarray:
    """Complete IoU (reference `bbox_iou(..., CIoU=True)`): IoU minus center
    distance over enclosing diagonal minus aspect-ratio consistency term."""
    import math
    if xywh:
        b1, b2 = xywh2xyxy(box1), xywh2xyxy(box2)
    else:
        b1, b2 = box1, box2
    iou = elementwise_iou(b1, b2, xywh=False, eps=eps)
    cw = jnp.maximum(b1[..., 2], b2[..., 2]) - jnp.minimum(b1[..., 0], b2[..., 0])
    ch = jnp.maximum(b1[..., 3], b2[..., 3]) - jnp.minimum(b1[..., 1], b2[..., 1])
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b1[..., 0] + b1[..., 2] - b2[..., 0] - b2[..., 2]) ** 2 +
            (b1[..., 1] + b1[..., 3] - b2[..., 1] - b2[..., 3]) ** 2) / 4
    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1]
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1]
    v = (4 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) -
                              jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def pairwise_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: box1 [..., M, 4] x box2 [..., N, 4] -> [..., M, N].

    Semantics of `MOTR/models/structures/boxes.py:pairwise_iou` and
    `ultralytics/utils/metrics.py:box_iou`.
    """
    b1 = box1[..., :, None, :]
    b2 = box2[..., None, :, :]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = box_area(b1) + box_area(b2) - inter + eps
    return inter / union


def pairwise_ciou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise CIoU of xyxy boxes -> [..., M, N]. The reference
    TaskAlignedAssigner's alignment metric (`utils/tal.py:157`,
    `bbox_iou(..., CIoU=True)`)."""
    return elementwise_ciou(box1[..., :, None, :], box2[..., None, :, :],
                            xywh=False, eps=eps)


def pairwise_giou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes -> [..., M, N] (used in matching costs)."""
    b1 = box1[..., :, None, :]
    b2 = box2[..., None, :, :]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = box_area(b1) + box_area(b2) - inter + eps
    iou = inter / union
    cx1 = jnp.minimum(b1[..., 0], b2[..., 0])
    cy1 = jnp.minimum(b1[..., 1], b2[..., 1])
    cx2 = jnp.maximum(b1[..., 2], b2[..., 2])
    cy2 = jnp.maximum(b1[..., 3], b2[..., 3])
    c_area = (cx2 - cx1) * (cy2 - cy1) + eps
    return iou - (c_area - union) / c_area


def scale_boxes(boxes: jnp.ndarray, from_shape, to_shape, padded: bool = True) -> jnp.ndarray:
    """Rescale xyxy boxes from a letterboxed `from_shape` (h, w) back to
    `to_shape` (h, w) original image coordinates. Mirrors
    `ultralytics/utils/ops.py:scale_boxes`.
    """
    fh, fw = from_shape
    th, tw = to_shape
    if padded:
        gain = min(fh / th, fw / tw)
        pad_x = (fw - tw * gain) / 2
        pad_y = (fh - th * gain) / 2
    else:  # scaleFill
        return jnp.stack([
            boxes[..., 0] * (tw / fw), boxes[..., 1] * (th / fh),
            boxes[..., 2] * (tw / fw), boxes[..., 3] * (th / fh)], axis=-1)
    out = jnp.stack([
        (boxes[..., 0] - pad_x) / gain, (boxes[..., 1] - pad_y) / gain,
        (boxes[..., 2] - pad_x) / gain, (boxes[..., 3] - pad_y) / gain], axis=-1)
    return clip_boxes(out, to_shape)


def clip_boxes(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (h, w)."""
    h, w = shape
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], axis=-1)
