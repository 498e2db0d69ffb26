"""FastSAM family tests (reference `ultralytics/models/fastsam/`):
everything-mode mask generation + box/point prompt selection."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fastsam():
    from mo_yolo_tpu.models.fastsam import FastSAM
    return FastSAM("tests/tiny_track.yaml", imgsz=64, conf=0.0, iou=0.9,
                   max_det=8)


def _img():
    img = np.full((64, 64, 3), 90, np.uint8)
    img[16:40, 12:36, 0] = 250
    return img


def test_everything_mode(fastsam):
    out = fastsam.everything(_img())
    n = len(out["boxes"])
    assert 0 < n <= 8
    assert out["scores"].shape == (n,)
    assert out["masks"].shape[0] == n and out["masks"].dtype == bool
    assert (np.diff(out["scores"]) <= 1e-6).all()  # score-sorted
    # NMS: pairwise IoU of kept boxes below the gate
    from mo_yolo_tpu.metrics.detection import box_iou_np
    if n > 1:
        iou = box_iou_np(out["boxes"], out["boxes"])
        np.fill_diagonal(iou, 0)
        assert iou.max() <= 0.9 + 1e-6


def test_box_and_point_prompts(fastsam):
    img = _img()
    ev = fastsam.everything(img)
    bb = ev["boxes"][0]
    sel = fastsam(img, bboxes=[bb])
    assert 1 <= len(sel["boxes"]) <= len(ev["boxes"])
    # point prompt on the center of the first mask
    m = ev["masks"][0]
    ys, xs = np.nonzero(m)
    if len(ys):
        Hp, Wp = m.shape
        py = ys.mean() / Hp * 64
        px = xs.mean() / Wp * 64
        sel2 = fastsam(img, points=[(px, py)])
        assert len(sel2["boxes"]) >= 0  # selection path runs
