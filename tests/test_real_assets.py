"""Real-photo pipeline smoke (SURVEY §4 item 3: the reference's
`ultralytics/assets/{bus,zidane}.jpg` single-image forwards,
`tests/test_python.py:51-83`). Weights are random — these pin pipeline
mechanics on genuine photos: JPEG decode, non-square letterbox, result
rescaling to original pixels, mask/keypoint shapes."""

from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

ASSETS = Path("/root/reference/ultralytics/assets")
pytestmark = pytest.mark.skipif(not ASSETS.is_dir(),
                                reason="reference assets not present")


def test_track_predict_on_real_photos(tmp_path):
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    n = 0
    for r in m.predict([str(ASSETS / "bus.jpg"),
                        str(ASSETS / "zidane.jpg")], conf=0.0):
        h, w = r.orig_shape
        assert (h, w) in ((1080, 810), (720, 1280))
        assert np.isfinite(r.boxes_xyxy).all()
        if len(r):
            assert r.boxes_xyxy[:, 0].min() >= -1
            assert r.boxes_xyxy[:, 2].max() <= w + 1
            assert r.boxes_xyxy[:, 3].max() <= h + 1
        n += 1
    assert n == 2


def test_segment_results_on_real_photo():
    from mo_yolo_tpu.api import YOLO

    seg = YOLO("tests/tiny_track.yaml", task="segment", nc=2, imgsz=64)
    for _, r in seg.predict(str(ASSETS / "bus.jpg"), as_results=True):
        assert r.orig_shape == (1080, 810)
        assert r.masks is not None and len(r.masks) == len(r)
        assert r.plot().shape == (1080, 810, 3)
