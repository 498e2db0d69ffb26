"""Rect (non-square imgsz) inference and validation.

The reference exposes rectangular sizes via `rect` / `imgsz=[h,w]`
(`cfg/default.yaml`, LetterBox `data/augment.py:540-585`); on TPU a rect
static shape is a straight perf win for wide video (640x384 is ~40% fewer
pixels than 640x640 for 16:9 sources). Everything stays statically
shaped — one compile per (h, w)."""

import numpy as np
import pytest


def test_to_hw_specs():
    from mo_yolo_tpu.data.letterbox import to_hw

    assert to_hw(640) == (640, 640)
    assert to_hw((384, 640)) == (384, 640)
    assert to_hw([384, 640]) == (384, 640)
    assert to_hw("1536x800") == (800, 1536)   # bench WxH convention
    assert to_hw("640") == (640, 640)


def test_dataset_rect_letterbox_normalization(tmp_path):
    """A wide 128x64 image with a known box letterboxes into (64, 96)
    with side pads; the stored normalized box must denormalize to the
    letterboxed pixel location exactly."""
    from PIL import Image
    from mo_yolo_tpu.data.dataset import TrackDataset

    img = np.full((64, 128, 3), 40, np.uint8)
    img[16:48, 32:64] = 220          # box x [32,64) y [16,48)
    p = tmp_path / "s01" / "000000.png"
    p.parent.mkdir()
    Image.fromarray(img).save(p)
    (tmp_path / "s01" / "000000.txt").write_text(
        f"0 {48/128:.6f} {32/64:.6f} {32/128:.6f} {32/64:.6f} 5\n")

    ds = TrackDataset([str(p)], imgsz=(64, 96), max_gt=4, clip_len=1)
    s = ds.load_frame(0)
    assert s.image.shape == (64, 96, 3)
    assert s.mask[0] and s.track_id[0] == 5
    # letterbox gain = min(64/64, 96/128) = 0.75, scaled 96x48, pad (0, 8)
    cx, cy, bw, bh = s.boxes[0]
    assert abs(cx * 96 - (48 * 0.75 + 0.0)) < 1e-4
    assert abs(cy * 64 - (32 * 0.75 + 8.0)) < 1e-4
    assert abs(bw * 96 - 32 * 0.75) < 1e-4
    assert abs(bh * 64 - 32 * 0.75) < 1e-4


def test_track_stream_rect(tmp_path):
    """Flagship-architecture tiny tracker runs at a rect static shape and
    maps boxes back to original pixels."""
    from PIL import Image
    from mo_yolo_tpu.api import MOTRTrack

    frames = []
    for t in range(3):
        img = np.full((64, 128, 3), 60, np.uint8)
        x = 30 + 6 * t
        img[24:44, x:x + 20, 2] = 255
        p = tmp_path / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        frames.append(str(p))

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=(64, 96), dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=0)
    assert (m.in_h, m.in_w) == (64, 96)
    n = 0
    for r in m.predict(frames, conf=0.0):
        n += 1
        if len(r):
            b = r.boxes_xyxy
            assert (b[:, 0] >= 0).all() and (b[:, 2] <= 128 + 1e-3).all()
            assert (b[:, 1] >= 0).all() and (b[:, 3] <= 64 + 1e-3).all()
    assert n == 3


def test_detector_rect_val(tmp_path):
    """Detector val at a rect shape: metrics finite, save_json scales by
    (w, h) per axis."""
    import json
    from PIL import Image
    from mo_yolo_tpu.api import Detector

    img_dir = tmp_path / "images" / "s01"
    lab_dir = tmp_path / "labels" / "s01"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    files = []
    for t in range(2):
        img = np.full((64, 128, 3), 90, np.uint8)
        img[20:40, 40:80, 0] = 250
        p = img_dir / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        (lab_dir / f"{t:06d}.txt").write_text(
            f"0 {60/128:.4f} {30/64:.4f} {40/128:.4f} {20/64:.4f} {t}\n")
        files.append(str(p))

    det = Detector("tests/tiny_track.yaml", nc=2, imgsz=(64, 96),
                   dtype="float32")
    m = det.val(files, max_gt=4, save_json=True,
                save_dir=str(tmp_path / "vj"))
    for k in ("mAP50", "mAP50-95", "fps"):
        assert k in m and np.isfinite(m[k]), (k, m)
    recs = json.loads((tmp_path / "vj" / "predictions.json").read_text())
    for r in recs:
        x, y, w, h = r["bbox"]
        # save_json maps boxes back to ORIGINAL-image pixels (w=128, h=64),
        # not the (96, 64) model-input frame
        assert 0 <= x <= 128 and 0 <= y <= 64
        assert x + w <= 128 + 1e-6 and y + h <= 64 + 1e-6


def test_rect_hw_derivation():
    from mo_yolo_tpu.data.letterbox import rect_hw

    assert rect_hw(1080, 1920, 640) == (384, 640)   # 16:9 -> 40% fewer px
    assert rect_hw(1920, 1080, 640) == (640, 384)   # portrait
    assert rect_hw(640, 640, 640) == (640, 640)     # square unchanged
    assert rect_hw(800, 1536, 1536) == (800, 1536)  # MOTR shape exact


def test_predict_rect_auto(tmp_path):
    """rect=True on predict picks the wide source's snapped shape and the
    pipeline runs end-to-end at it."""
    from PIL import Image
    from mo_yolo_tpu.api import MOTRTrack

    frames = []
    for t in range(2):
        img = np.full((64, 128, 3), 60, np.uint8)
        img[20:44, 40 + 4 * t:70 + 4 * t, 2] = 255
        p = tmp_path / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        frames.append(str(p))

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=0)
    # rect_hw(64, 128, 64) = (32, 64)
    n = sum(1 for _ in m.predict(frames, conf=0.0, rect=True))
    assert n == 2


def test_model_info_summary():
    """info() (reference Model.info): layer/param counts, detailed rows,
    and XLA-counted GFLOPs on the tiny flagship-architecture model."""
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=0)
    out = m.info(verbose=False)
    assert out["params"] > 1000 and out["layers"] > 10
    out2 = m.info(verbose=False, flops=True)
    assert out2["gflops"] > 0, out2
