"""Segment/Pose/Classify head shape + decode tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mo_yolo_tpu.models.heads_extra import (
    ClassifyHead, PoseHead, Proto, SegmentHead)


def _feats(B=2):
    return [jnp.zeros((B, 8, 8, 64)), jnp.zeros((B, 4, 4, 128)),
            jnp.zeros((B, 2, 2, 128))]


def test_segment_head():
    head = SegmentHead(nc=3, nm=8)
    feats = _feats()
    v = head.init(jax.random.PRNGKey(0), feats)
    boxes, cls, coef, protos = head.apply(v, feats)
    S = 64 + 16 + 4
    assert boxes.shape == (2, S, 4)
    assert cls.shape == (2, S, 3)
    assert coef.shape == (2, S, 8)
    assert protos.shape == (2, 16, 16, 8)  # 2x upsample of P3
    masks = SegmentHead.masks(coef, protos)
    assert masks.shape == (2, S, 16, 16)
    m = np.asarray(masks)
    assert (m >= 0).all() and (m <= 1).all()


def test_pose_head():
    head = PoseHead(nc=1, kpt_shape=(5, 3))
    feats = _feats(1)
    v = head.init(jax.random.PRNGKey(0), feats)
    boxes, cls, kpts = head.apply(v, feats)
    S = 84
    assert kpts.shape == (1, S, 5, 3)
    vis = np.asarray(kpts[..., 2])
    assert (vis >= 0).all() and (vis <= 1).all()


def test_classify_head():
    head = ClassifyHead(nc=10, c_=64)
    x = jnp.zeros((3, 4, 4, 128))
    v = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(v, x)
    assert logits.shape == (3, 10)


def test_task_facade_nms_knobs():
    """conf/iou/max_det (reference val/predict keys) reach the on-device
    NMS via the segment/pose model fields."""
    from mo_yolo_tpu.api import YOLO

    y = YOLO("tests/tiny_track.yaml", task="pose", imgsz=64,
             conf=0.3, iou=0.5, max_det=7, agnostic_nms=True)
    m = y.model
    assert (m.conf, m.iou, m.max_det, m.agnostic) == (0.3, 0.5, 7, True)
