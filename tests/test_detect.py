"""Detection task tests: RT-DETR-style model, YOLOv8 DFL head, NMS."""

import numpy as np
import jax
import jax.numpy as jnp

from mo_yolo_tpu.models.detect import (
    DetectionModel, YoloDetectHead, build_detection_model, nms_fixed)
from mo_yolo_tpu.models.graph import parse_model_yaml


def test_detection_model_forward():
    spec = parse_model_yaml("tests/tiny_track.yaml")
    m = DetectionModel(spec=spec, hd=32, nq=16, ndl=2, d_ffn=32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    boxes, scores, cls = m.apply(v, jnp.zeros((1, 64, 64, 3)),
                                 method=m.predict_step)
    assert boxes.shape == (1, 16, 4)
    assert scores.shape == (1, 16) and cls.shape == (1, 16)
    assert np.all(np.asarray(boxes) >= 0) and np.all(np.asarray(boxes) <= 1)


def test_yolo_detect_head_shapes():
    head = YoloDetectHead(nc=5)
    feats = [jnp.zeros((2, 8, 8, 64)), jnp.zeros((2, 4, 4, 128)),
             jnp.zeros((2, 2, 2, 128))]
    v = head.init(jax.random.PRNGKey(0), feats)
    boxes, cls = head.apply(v, feats)
    S = 64 + 16 + 4
    assert boxes.shape == (2, S, 4)
    assert cls.shape == (2, S, 5)
    b = np.asarray(boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_nms_suppresses_duplicates():
    boxes = jnp.asarray([[10, 10, 50, 50], [12, 12, 52, 52],
                         [100, 100, 140, 140], [11, 11, 51, 51]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    cls = jnp.asarray([0, 0, 0, 0], jnp.int32)
    b, s, c, valid = nms_fixed(boxes, scores, cls, iou_thresh=0.5,
                               conf_thresh=0.25, max_det=10)
    assert int(valid.sum()) == 2
    kept = np.asarray(s[valid])
    np.testing.assert_allclose(sorted(kept, reverse=True), [0.9, 0.7])


def test_nms_class_aware():
    boxes = jnp.asarray([[10, 10, 50, 50], [12, 12, 52, 52]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    cls = jnp.asarray([0, 1], jnp.int32)  # different classes -> both kept
    _, _, _, valid = nms_fixed(boxes, scores, cls, iou_thresh=0.5)
    assert int(valid.sum()) == 2


def test_nms_conf_threshold_and_jit():
    f = jax.jit(lambda b, s, c: nms_fixed(b, s, c, conf_thresh=0.5, max_det=4))
    boxes = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (20, 4)),
                        dtype=jnp.float32)
    boxes = jnp.concatenate([boxes[:, :2], boxes[:, :2] + 10], 1)
    scores = jnp.linspace(0, 1, 20)
    cls = jnp.zeros(20, jnp.int32)
    b, s, c, valid = f(boxes, scores, cls)
    assert np.asarray(s[valid]).min() >= 0.5
    assert valid.shape == (4,)
