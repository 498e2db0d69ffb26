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


import pytest


@pytest.mark.slow
def test_detect_train_step_runs_and_improves():
    from mo_yolo_tpu.train.losses import LossConfig
    from mo_yolo_tpu.train.train_step import TrainConfig
    from mo_yolo_tpu.train.detect_trainer import make_detect_train_step

    spec = parse_model_yaml("tests/tiny_track.yaml")
    m = DetectionModel(spec=spec, hd=32, nq=12, ndl=2, d_ffn=64)
    B, G, H = 1, 2, 64
    rng = np.random.default_rng(0)
    imgs = np.full((B, H, H, 3), 0.3, np.float32)
    boxes = np.zeros((B, G, 4), np.float32)
    for k, (cx, cy) in enumerate([(20, 24), (44, 40)]):
        imgs[0, cy - 6:cy + 6, cx - 6:cx + 6, k] = 1.0
        boxes[0, k] = [cx / H, cy / H, 12 / H, 12 / H]
    batch = {
        "images": jnp.asarray(imgs),
        "gt_cls": jnp.asarray([[0, 1]], jnp.int32),
        "gt_boxes": jnp.asarray(boxes),
        "gt_mask": jnp.ones((B, G), bool),
    }
    v = m.init(jax.random.PRNGKey(0), batch["images"])
    init_fn, step_fn = make_detect_train_step(
        m, LossConfig(nc=spec.nc),
        TrainConfig(lr=2e-3, warmup_steps=5, total_steps=100))
    ts = init_fn(v)
    step = jax.jit(step_fn, donate_argnums=(0,))
    key = jax.random.PRNGKey(0)
    first = last = None
    for i in range(25):
        key, k = jax.random.split(key)
        ts, met = step(ts, batch, k)
        if i == 0:
            first = float(met["loss"])
        last = float(met["loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_detect_trainer_and_standalone_validator(tmp_path):
    """Host DetectTrainer + DetectionValidator end-to-end on a tiny on-disk
    dataset (VERDICT round-1 item #9): train a few steps, loss finite and
    decreasing trend, standalone mAP val produces finite metrics."""
    from PIL import Image
    from mo_yolo_tpu.api import Detector

    img_dir = tmp_path / "images" / "s01"
    lab_dir = tmp_path / "labels" / "s01"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    files = []
    for t in range(8):
        img = np.full((64, 64, 3), 90, np.uint8)
        x = 12 + 3 * t
        img[20:36, x:x + 16, 0] = 250
        p = img_dir / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        (lab_dir / f"{t:06d}.txt").write_text(
            f"0 {(x + 8) / 64:.4f} {28 / 64:.4f} 0.25 0.25 {t}\n")
        files.append(str(p))
    (tmp_path / "train.txt").write_text("\n".join(files))
    (tmp_path / "data.yaml").write_text(
        f"path: {tmp_path}\ntrain: train.txt\nval: train.txt\n"
        "nc: 2\nnames:\n  0: a\n  1: b\n")

    det = Detector("tests/tiny_track.yaml", nc=2, imgsz=64, dtype="float32")
    r = det.train(str(tmp_path / "data.yaml"), epochs=2, batch=4, lr=1e-3,
                  max_gt=4, save_dir=str(tmp_path / "runs"), log_every=1)
    assert np.isfinite(r["final_loss"])
    # val_every default = auto: the dataset has a val split, so training
    # validates each epoch, selects `best` by 0.1*mAP50 + 0.9*mAP50-95
    # (reference fitness), and final-evals the best checkpoint — the
    # returned metrics are val metrics, not just a loss
    assert "mAP50" in r and np.isfinite(r["mAP50"]), r
    assert (tmp_path / "runs" / "best").exists()
    # augment=True exercises the per-frame begin_clip path (regression:
    # single-image training crashed on the clip-frozen augmenter) plus the
    # copy_paste / perspective / warmup_epochs hyp keys
    r2 = det.train(str(tmp_path / "data.yaml"), epochs=1, batch=4, lr=1e-3,
                   max_gt=8, save_dir=str(tmp_path / "runs2"), log_every=1,
                   augment=True,
                   hyp={"copy_paste": 1.0, "perspective": 0.001,
                        "mosaic": 0.5, "warmup_epochs": 1.0})
    assert np.isfinite(r2["final_loss"])
    m = det.val(str(tmp_path / "data.yaml"), max_gt=4, save_json=True,
                save_dir=str(tmp_path / "vj"))
    for k in ("mAP50", "mAP50-95", "fps"):
        assert k in m and np.isfinite(m[k]), (k, m)
    # COCO predictions.json (reference save_json / pred_to_json)
    import json
    recs = json.loads((tmp_path / "vj" / "predictions.json").read_text())
    assert isinstance(recs, list)
    if recs:    # records only exist once the tiny model predicts something
        r0 = recs[0]
        assert set(r0) == {"image_id", "category_id", "bbox", "score"}
        assert isinstance(r0["image_id"], int)  # numeric stems -> int ids
        assert len(r0["bbox"]) == 4 and r0["bbox"][2] >= 0


def test_detector_export_roundtrip(tmp_path):
    """Detector.export jaxexport artifact replays the predict step."""
    import pathlib
    import jax.numpy as jnp
    from jax import export as jexport
    from mo_yolo_tpu.api import Detector

    m = Detector("tests/tiny_detr.yaml", imgsz=64, dtype="float32")
    p = m.export("jaxexport", path=str(tmp_path / "det"))
    exp = jexport.deserialize(pathlib.Path(p).read_bytes())
    boxes, scores, cls = exp.call(jnp.zeros((1, 64, 64, 3)))
    assert boxes.shape == (1, m.model.nq, 4)
    live = m._step(m.variables, jnp.zeros((1, 64, 64, 3)))
    import numpy as np
    np.testing.assert_allclose(np.asarray(live[0]), np.asarray(boxes),
                               atol=1e-5)
    assert m.export("params", path=str(tmp_path / "w"))


def test_val_missing_split_raises(tmp_path):
    """val(split='test') on a yaml without a test split must raise, not
    silently evaluate val and mislabel the result."""
    import pytest
    from PIL import Image
    from mo_yolo_tpu.api import Detector

    img_dir = tmp_path / "images" / "s"
    lab_dir = tmp_path / "labels" / "s"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    p = img_dir / "000000.png"
    Image.fromarray(np.full((64, 64, 3), 90, np.uint8)).save(p)
    (lab_dir / "000000.txt").write_text("0 0.5 0.5 0.25 0.25 0\n")
    (tmp_path / "train.txt").write_text(str(p))
    (tmp_path / "data.yaml").write_text(
        f"path: {tmp_path}\ntrain: train.txt\nval: train.txt\n"
        "nc: 1\nnames:\n  0: a\n")

    det = Detector("tests/tiny_track.yaml", nc=1, imgsz=64, dtype="float32")
    with pytest.raises(ValueError, match="split='test'"):
        det.val(str(tmp_path / "data.yaml"), split="test")
