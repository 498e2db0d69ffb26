"""Secondary task heads: Segment / Pose / Classify.

Equivalents of the reference's non-track task heads
(`nn/modules/head.py:27-599`: `Segment`, `Pose`, `Classify`, built on the
same `Detect` DFL head). Inference-level parity for the inherited task
families (`tasks.py:520-629`); their training losses are round-2 scope
(see STATUS.md).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.models.detect import YoloDetectHead
from mo_yolo_tpu.models.layers import ConvBnAct


class Proto(nn.Module):
    """Mask prototype generator (reference `block.py:Proto`): conv ->
    2x upsample -> conv -> conv to nm prototype channels on P3."""

    c_: int = 256
    nm: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p3, train: bool = False):
        x = ConvBnAct(self.c_, 3, dtype=self.dtype, name="cv1")(p3, train)
        # learned 2x upsample, matching the reference's ConvTranspose2d
        # (`block.py:44`) so imported weights reproduce its masks
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2),
                             padding="VALID", dtype=self.dtype,
                             name="upsample")(x)
        x = ConvBnAct(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBnAct(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class SegmentHead(nn.Module):
    """Detect + per-anchor mask coefficients + prototypes
    (reference `Segment`, `head.py`): masks = sigmoid(coef @ protos)."""

    nc: int
    nm: int = 32
    npr: int = 256           # proto hidden channels (width-scaled by parse)
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 raw: bool = False):
        det = YoloDetectHead(self.nc, self.strides, dtype=self.dtype,
                             name="detect")(feats, raw=raw)
        protos = Proto(c_=self.npr, nm=self.nm, dtype=self.dtype,
                       name="proto")(feats[0], train)          # [B,2h,2w,nm]
        coefs = []
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        for i, f in enumerate(feats):
            y = ConvBnAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(f, train)
            y = ConvBnAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.nm, (1, 1), dtype=self.dtype,
                        name=f"cv4_{i}_2")(y)
            coefs.append(y.reshape(y.shape[0], -1, self.nm))
        coef = jnp.concatenate(coefs, 1)                       # [B,S,nm]
        if raw:
            box_dist, cls_logits, anchors, strides = det
            return box_dist, cls_logits, anchors, strides, coef, protos
        boxes, cls = det
        return boxes, cls, coef, protos

    @staticmethod
    def masks(coef, protos):
        """[B,S,nm] x [B,H,W,nm] -> [B,S,H,W] sigmoid masks."""
        return jax.nn.sigmoid(jnp.einsum("bsn,bhwn->bshw", coef, protos))


class PoseHead(nn.Module):
    """Detect + keypoint regression (reference `Pose`): per-anchor
    (kpt_shape) offsets decoded against anchor centers."""

    nc: int
    kpt_shape: Tuple[int, int] = (17, 3)
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False,
                 raw: bool = False):
        det = YoloDetectHead(self.nc, self.strides, dtype=self.dtype,
                             name="detect")(feats, raw=raw)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(feats[0].shape[-1] // 4, nk)
        outs, ancs, strs = [], [], []
        for i, f in enumerate(feats):
            y = ConvBnAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(f, train)
            y = ConvBnAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(nk, (1, 1), dtype=self.dtype, name=f"cv4_{i}_2")(y)
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h * w, *self.kpt_shape))
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing="ij")
            ancs.append(jnp.stack([gx + 0.5, gy + 0.5], -1).reshape(-1, 2))
            strs.append(jnp.full((h * w,), float(self.strides[i])))
        kpt = jnp.concatenate(outs, 1)                    # [B,S,K,3]
        anc = jnp.concatenate(ancs, 0)
        st = jnp.concatenate(strs, 0)
        xy = (kpt[..., :2] * 2.0 + (anc[None, :, None, :] - 0.5)) * \
            st[None, :, None, None]
        if raw:
            box_dist, cls_logits, anchors, strides = det
            # decoded keypoint xy in pixels + raw visibility logits
            return (box_dist, cls_logits, anchors, strides,
                    jnp.concatenate([xy, kpt[..., 2:3]], -1))
        boxes, cls = det
        vis = jax.nn.sigmoid(kpt[..., 2:3])
        return boxes, cls, jnp.concatenate([xy, vis], -1)


class SegmentationModel(nn.Module):
    """Backbone graph + SegmentHead + on-device NMS (the reference
    SegmentationModel, `tasks.py:286-303`). `predict_step` returns
    fixed-slot (boxes xyxy px, scores, cls, coef, protos)."""

    spec: Any
    nm: int = 32
    max_det: int = 100
    conf: float = 0.001
    iou: float = 0.7
    agnostic: bool = False   # cross-class suppression (reference agnostic_nms)
    retina_masks: bool = False  # compose masks at input res (reference
                                # `retina_masks` -> ops.process_mask_native)
    dtype: Any = jnp.float32

    def setup(self):
        from mo_yolo_tpu.models.graph import BackboneNeck
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        ha = getattr(self.spec, "head_args", ())
        nm = int(ha[1]) if len(ha) >= 2 else self.nm
        npr = int(ha[2]) if len(ha) >= 3 else 256
        self.head = SegmentHead(self.spec.nc, nm, npr,
                                self.spec.out_strides, dtype=self.dtype)

    def __call__(self, images, train: bool = False, raw: bool = False):
        return self.head(self.backbone(images, train=train), train=train,
                         raw=raw)

    def predict_step(self, images):
        from mo_yolo_tpu.models.detect import nms_fixed
        boxes, cls_p, coef, protos = self(images, train=False)

        def one(b, c, co):
            bb, ss, cc, valid, cok = nms_fixed(
                b, c.max(-1), jnp.argmax(c, -1), iou_thresh=self.iou,
                conf_thresh=self.conf, max_det=self.max_det, agnostic=self.agnostic, extras=[co])
            return bb, ss * valid, cc.astype(jnp.int32), cok

        bb, ss, cc, cok = jax.vmap(one)(boxes, cls_p, coef)
        return bb, ss, cc, cok, protos

    def compose_masks(self, boxes, coef, protos):
        """Per-detection masks from NMS-kept coefficients, cropped to
        their boxes; always returned at input resolution [B,S,H,W].

        `boxes` xyxy in input pixels [B,S,4]. Default path mirrors the
        reference `ops.process_mask(upsample=True)` (compose+crop at
        proto res, then bilinear-upsample); with `retina_masks=True` it
        mirrors `ops.process_mask_native` (upsample protos FIRST, then
        compose+crop at native res — crisper edges, more FLOPs).
        Reference: `ultralytics/utils/ops.py` process_mask*."""
        B, Hp, Wp, nm = protos.shape
        H, W = Hp * 4, Wp * 4          # protos live at stride 4

        def crop(m, bx):
            # zero outside the (possibly fractional) box on m's own grid
            h, w = m.shape[-2:]
            ys = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
            xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
            x1, y1, x2, y2 = (bx[..., i][:, :, None, None] for i in range(4))
            keep = (xs >= x1) & (xs < x2) & (ys >= y1) & (ys < y2)
            return m * keep
        if self.retina_masks:
            pr = jax.image.resize(protos, (B, H, W, nm), "bilinear")
            m = jax.nn.sigmoid(jnp.einsum("bsn,bhwn->bshw", coef, pr))
            return crop(m, boxes)
        m = jax.nn.sigmoid(jnp.einsum("bsn,bhwn->bshw", coef, protos))
        m = crop(m, boxes / 4.0)
        return jax.image.resize(m, (B, m.shape[1], H, W), "bilinear")


class PoseModel(nn.Module):
    """Backbone graph + PoseHead + on-device NMS; `predict_step` returns
    (boxes xyxy px, scores, cls, kpts [.,K,3])."""

    spec: Any
    kpt_shape: Tuple[int, int] = (17, 3)
    max_det: int = 100
    conf: float = 0.001
    iou: float = 0.7
    agnostic: bool = False   # cross-class suppression (reference agnostic_nms)
    dtype: Any = jnp.float32

    def setup(self):
        from mo_yolo_tpu.models.graph import BackboneNeck
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.head = PoseHead(self.spec.nc, self.kpt_shape,
                             self.spec.out_strides, dtype=self.dtype)

    def __call__(self, images, train: bool = False, raw: bool = False):
        return self.head(self.backbone(images, train=train), train=train,
                         raw=raw)

    def predict_step(self, images):
        from mo_yolo_tpu.models.detect import nms_fixed
        boxes, cls_p, kpts = self(images, train=False)

        def one(b, c, k):
            bb, ss, cc, valid, kk = nms_fixed(
                b, c.max(-1), jnp.argmax(c, -1), iou_thresh=self.iou,
                conf_thresh=self.conf, max_det=self.max_det, agnostic=self.agnostic, extras=[k])
            return bb, ss * valid, cc.astype(jnp.int32), kk

        return jax.vmap(one)(boxes, cls_p, kpts)


class ClassifyHead(nn.Module):
    """Image classification head (reference `Classify`): conv -> GAP ->
    dropout -> dense logits over the deepest feature map (the reference
    exposes the `dropout` train key, `nn/modules/head.py` Classify.drop)."""

    nc: int
    c_: int = 1280
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False):
        x = ConvBnAct(self.c_, 1, dtype=self.dtype, name="conv")(feat, train)
        x = x.mean(axis=(1, 2))
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=not train)
        return nn.Dense(self.nc, dtype=self.dtype, name="linear")(x)


class ClassifyModel(nn.Module):
    """Backbone graph + ClassifyHead over the deepest tap (reference
    ClassificationModel, `tasks.py:306-337`)."""

    spec: Any
    nc: int
    c_: int = 1280
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        from mo_yolo_tpu.models.graph import BackboneNeck
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.head = ClassifyHead(self.nc, self.c_, dropout=self.dropout,
                                 dtype=self.dtype)

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train=train)
        return self.head(feats[-1], train=train)
