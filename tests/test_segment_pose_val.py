"""Segmentation / Pose metrics and validators (reference
`models/yolo/segment/val.py`, `models/yolo/pose/val.py`)."""

import numpy as np
import pytest
import yaml


def test_mask_iou_and_oks():
    from mo_yolo_tpu.metrics.segment_pose import mask_iou_np, oks_np

    a = np.zeros((1, 8, 8), bool)
    a[0, :4, :4] = True
    b = np.zeros((2, 8, 8), bool)
    b[0, :4, :4] = True          # identical -> 1
    b[1, :4, 2:6] = True         # half overlap -> 8/24
    iou = mask_iou_np(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 8 / 24], atol=1e-6)

    gt = np.zeros((1, 5, 3))
    gt[0, :, 0] = [10, 20, 30, 40, 50]
    gt[0, :, 1] = 15
    gt[0, :, 2] = 1              # all visible
    pred = gt[..., :2].copy()
    oks = oks_np(gt, pred, areas=np.array([900.0]))
    np.testing.assert_allclose(oks, [[1.0]], atol=1e-6)
    far = pred + 100.0
    assert oks_np(gt, far, np.array([900.0]))[0, 0] < 0.01


def test_perfect_predictions_give_map1():
    from mo_yolo_tpu.metrics.segment_pose import PoseMetrics, SegmentMetrics

    masks = np.zeros((2, 16, 16), bool)
    masks[0, :8, :8] = True
    masks[1, 8:, 8:] = True
    boxes = np.array([[0, 0, .5, .5], [.5, .5, 1, 1]], np.float32)
    cls = np.array([0, 1])
    sm = SegmentMetrics(nc=2)
    sm.update(boxes, masks, np.array([0.9, 0.8]), cls, boxes, masks, cls)
    out = sm.compute()
    # percent scale, 101-pt interpolated AP tops out at 99.5 for a
    # single-point PR curve (same convention as DetMetrics)
    assert out["mAP50(B)"] >= 99.0 and out["precision(B)"] == 100.0
    assert out["mAP50(M)"] >= 99.0 and out["recall(M)"] == 100.0

    kpts = np.zeros((2, 4, 3))
    kpts[..., 0] = [[1, 2, 3, 4], [5, 6, 7, 8]]
    kpts[..., 1] = 2.0
    kpts[..., 2] = 1
    pm = PoseMetrics(nc=2)
    bx = np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32)
    pm.update(bx, kpts[..., :2], np.array([0.9, 0.8]), cls, bx, kpts, cls)
    out = pm.compute()
    assert out["mAP50(B)"] >= 99.0
    assert out["mAP50(P)"] >= 99.0


def test_label_parsers(tmp_path):
    from mo_yolo_tpu.data.seg_pose_labels import (
        parse_pose_label, parse_seg_label, polygons_to_boxes,
        rasterize_polygons)

    seg = tmp_path / "s.txt"
    seg.write_text("0 0.1 0.1 0.5 0.1 0.5 0.5 0.1 0.5\n"
                   "1 0.6 0.6 0.9 0.6 0.75 0.9\n")
    cls, polys = parse_seg_label(str(seg))
    assert list(cls) == [0, 1] and len(polys[0]) == 4
    boxes = polygons_to_boxes(polys)
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.5, 0.5], atol=1e-6)
    m = rasterize_polygons(polys, 32)
    assert m.shape == (2, 32, 32) and m[0].sum() > 50

    pose = tmp_path / "p.txt"
    pose.write_text("0 0.5 0.5 0.2 0.2 0.4 0.4 2 0.6 0.6 1\n")
    cls, bx, kp = parse_pose_label(str(pose), n_kpt=2)
    assert kp.shape == (1, 2, 3) and bx.shape == (1, 4)


@pytest.fixture(scope="module")
def tiny_spec():
    from mo_yolo_tpu.models.graph import parse_model_yaml
    return parse_model_yaml("tests/tiny_track.yaml", nc=2)


def test_validators_end_to_end(tiny_spec, tmp_path):
    """Untrained models through the full validator loop: metric dict with
    box/mask (or kpt) keys, no NaN, labels parsed from disk."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from mo_yolo_tpu.engine.validator import (PoseValidator,
                                              SegmentationValidator)
    from mo_yolo_tpu.models.heads_extra import PoseModel, SegmentationModel

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    files = []
    for i in range(2):
        p = tmp_path / "images" / f"{i}.jpg"
        Image.fromarray(np.full((64, 64, 3), 120, np.uint8)).save(p)
        files.append(str(p))
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.2 0.2 0.6 0.2 0.6 0.6 0.2 0.6\n")
    seg = SegmentationModel(spec=tiny_spec, max_det=8)
    v = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = SegmentationValidator(seg, v, imgsz=64)(files)
    assert "mAP50(M)" in out and "mAP50(B)" in out
    assert all(np.isfinite(x) for x in out.values())

    for i in range(2):
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.4 0.4 0.3 0.3 0.35 0.35 2 0.45 0.45 1\n")
    pose = PoseModel(spec=tiny_spec, kpt_shape=(2, 3), max_det=8)
    vp = pose.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = PoseValidator(pose, vp, imgsz=64)(files)
    assert "mAP50(P)" in out and "mAP50(B)" in out
    assert all(np.isfinite(x) for x in out.values())


def test_oks_exponent_matches_cocoeval():
    """Round-2 advisor: exponent must be d^2 / ((2*sigma)^2 * area * 2)
    (reference `kpt_iou`, utils/metrics.py) — a hand value pins the
    factor-of-2 that was previously missing."""
    from mo_yolo_tpu.metrics.segment_pose import oks_np

    gt = np.zeros((1, 1, 3))
    gt[0, 0] = [10.0, 20.0, 1.0]
    pred = np.array([[[14.0, 20.0]]])        # d^2 = 16
    sig = np.array([0.05])
    oks = oks_np(gt, pred, areas=np.array([900.0]), sigmas=sig)
    # exp(-16 / ((2*.05)^2 * 900 * 2)) = exp(-16/18)
    np.testing.assert_allclose(oks, [[np.exp(-16.0 / 18.0)]], rtol=1e-6)
