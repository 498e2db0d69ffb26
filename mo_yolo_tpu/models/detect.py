"""Detection task models.

Two detect-head families, mirroring the reference:

  * `DetectionModel` — RT-DETR-style decoder detection (the reference
    `RTDETRDecoder`, `nn/modules/head.py:602-804`): our `TrackDecoder` with
    zero track slots; set prediction, no NMS.
  * `YoloDetectHead` — the anchor-free YOLOv8 `Detect` head with DFL box
    regression (`nn/modules/head.py:27-87` + `block.py:DFL`): dense
    per-level predictions decoded against anchor points, NMS'd on device
    with the same fixed-point greedy suppression the tracker uses.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.models.decoder import TrackDecoder
from mo_yolo_tpu.models.graph import BackboneNeck, GraphSpec, parse_model_yaml
from mo_yolo_tpu.models.layers import ConvBnAct
from mo_yolo_tpu.models.tracker import greedy_keep_from_conflicts
from mo_yolo_tpu.ops.boxes import pairwise_iou


class DetectionModel(nn.Module):
    """Backbone + decoder-only detection (RT-DETR style, no track slots)."""

    spec: GraphSpec
    hd: int = 256
    nq: int = 300
    ndl: int = 6
    d_ffn: int = 1024
    impl: str = "xla"
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.decoder = TrackDecoder(
            nc=self.spec.nc, hd=self.hd, nq=self.nq, n_track=0,
            ndl=self.ndl, d_ffn=self.d_ffn, impl=self.impl, dtype=self.dtype)

    def __call__(self, images, train: bool = False, dn_cls=None,
                 dn_bbox_logit=None, dn_attn_mask=None):
        feats = self.backbone(images, train=train)
        return self.decoder(feats, train=train, dn_cls=dn_cls,
                            dn_bbox_logit=dn_bbox_logit,
                            dn_attn_mask=dn_attn_mask)

    def predict_step(self, images):
        """One jitted detection step -> (boxes cxcywh [B,nq,4],
        scores [B,nq], cls [B,nq])."""
        out = self(images, train=False)
        boxes = out["dec_bboxes"][-1].astype(jnp.float32)
        logits = out["dec_scores"][-1].astype(jnp.float32)
        scores = jax.nn.sigmoid(logits)
        return boxes, scores.max(-1), jnp.argmax(logits, -1).astype(jnp.int32)


def build_detection_model(cfg_path: str, nc: Optional[int] = None,
                          impl: Optional[str] = None,
                          dtype=jnp.float32) -> DetectionModel:
    if impl is None:
        impl = "onehot" if jax.default_backend() not in ("cpu",) else "xla"
    spec = parse_model_yaml(cfg_path, nc=nc)
    return DetectionModel(spec=spec, impl=impl, dtype=dtype)


# --------------------------------------------------------------------- #
# YOLOv8 anchor-free Detect head (DFL)
# --------------------------------------------------------------------- #
class YoloDetectHead(nn.Module):
    """Reference `Detect` head: per-level box branch (4*reg_max DFL bins)
    and class branch; decode = softmax-expectation over bins relative to
    anchor centers, scaled by stride."""

    nc: int
    strides: Tuple[int, ...] = (8, 16, 32)
    reg_max: int = 16
    act: Any = True      # yaml activation override reaches the head's
    dtype: Any = jnp.float32  # convs too (reference Conv.default_act)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], raw: bool = False):
        """feats: NHWC per level. Returns (boxes xyxy [B,S,4] in input px,
        cls scores [B,S,nc] probabilities) — or, with raw=True, the training
        tuple (box_dist [B,S,4,reg_max], cls_logits [B,S,nc],
        anchors [S,2] cells, strides [S]) consumed by
        `train.v8_loss.v8_detection_loss`."""
        B = feats[0].shape[0]
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.nc, 100))
        all_box, all_cls, all_anchor, all_stride = [], [], [], []
        for i, f in enumerate(feats):
            b = ConvBnAct(c2, 3, act=self.act, dtype=self.dtype,
                          name=f"cv2_{i}_0")(f)
            b = ConvBnAct(c2, 3, act=self.act, dtype=self.dtype,
                          name=f"cv2_{i}_1")(b)
            b = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype,
                        name=f"cv2_{i}_2")(b)
            c = ConvBnAct(c3, 3, act=self.act, dtype=self.dtype,
                          name=f"cv3_{i}_0")(f)
            c = ConvBnAct(c3, 3, act=self.act, dtype=self.dtype,
                          name=f"cv3_{i}_1")(c)
            c = nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                        name=f"cv3_{i}_2")(c)
            h, w = f.shape[1:3]
            all_box.append(b.reshape(B, h * w, 4, self.reg_max))
            all_cls.append(c.reshape(B, h * w, self.nc))
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            anchors = jnp.stack([gx + 0.5, gy + 0.5], -1).reshape(-1, 2)
            all_anchor.append(anchors)
            all_stride.append(jnp.full((h * w,), float(self.strides[i])))
        box = jnp.concatenate(all_box, 1)      # [B,S,4,reg_max]
        cls_logits = jnp.concatenate(all_cls, 1)
        anchor = jnp.concatenate(all_anchor, 0)  # [S,2] in cells
        stride = jnp.concatenate(all_stride, 0)  # [S]
        if raw:
            return box, cls_logits, anchor, stride
        cls = jax.nn.sigmoid(cls_logits)
        # DFL decode: distances = expectation over softmaxed bins
        dist = jnp.sum(jax.nn.softmax(box, -1) *
                       jnp.arange(self.reg_max, dtype=box.dtype), -1)  # [B,S,4]
        lt, rb = dist[..., :2], dist[..., 2:]
        x1y1 = (anchor[None] - lt) * stride[None, :, None]
        x2y2 = (anchor[None] + rb) * stride[None, :, None]
        return jnp.concatenate([x1y1, x2y2], -1), cls


def nms_fixed(boxes_xyxy: jnp.ndarray, scores: jnp.ndarray, cls: jnp.ndarray,
              iou_thresh: float = 0.7, conf_thresh: float = 0.25,
              max_det: int = 300, extras=None, agnostic: bool = False):
    """Jittable class-aware NMS with fixed output size (reference
    `ops.non_max_suppression` surface): sort by score, greedy-suppress via
    the same fixed-point algorithm as the tracker's duplicate filter.
    `agnostic=True` suppresses across classes (reference `agnostic_nms`).

    Single image: boxes [N,4], scores [N], cls [N]. Returns
    (boxes [max_det,4], scores [max_det], cls [max_det], valid [max_det]).
    """
    N = boxes_xyxy.shape[0]
    order = jnp.argsort(-scores)
    b = boxes_xyxy[order]
    s = scores[order]
    c = cls[order]
    valid = s >= conf_thresh
    iou = pairwise_iou(b, b)
    same_cls = jnp.ones((N, N), bool) if agnostic else \
        (c[:, None] == c[None, :])
    earlier = jnp.triu(jnp.ones((N, N), bool), k=1)
    conflict = (iou > iou_thresh) & same_cls & earlier & \
        valid[:, None] & valid[None, :]
    keep = greedy_keep_from_conflicts(conflict, valid)  # to convergence
    # compact to max_det
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    ok = keep & (pos < max_det)
    slot = jnp.where(ok, pos, max_det)

    def scat(src, fill=0.0):
        buf = jnp.full((max_det + 1, *src.shape[1:]), fill, src.dtype)
        return buf.at[slot].set(src)[:max_det]

    base = (scat(b), scat(s), scat(c, fill=-1),
            scat(ok.astype(jnp.int32)).astype(bool))
    if extras is None:
        return base
    # per-anchor payloads (mask coefs, keypoints, ...) compact through the
    # same keep/slot mapping, pre-sorted by the same score order
    return base + tuple(scat(e[order]) for e in extras)
