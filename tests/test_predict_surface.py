"""Predict-surface parity: plot options, save/save_crop, vid_stride,
agnostic NMS (reference `Results.plot/save/save_crop`
`engine/results.py:366-556`, `vid_stride` `data/loaders.py:205`,
`agnostic_nms` `ops.non_max_suppression`)."""

import io
import numpy as np
import pytest

from mo_yolo_tpu.engine.results import TrackResults


def _res(with_img=True):
    img = (np.random.default_rng(0).uniform(0, 255, (64, 80, 3))
           .astype(np.uint8)) if with_img else None
    return TrackResults(
        boxes_xyxy=np.array([[10.0, 10.0, 30.0, 40.0],
                             [40.0, 20.0, 70.0, 50.0]]),
        conf=np.array([0.9, 0.7]),
        cls=np.array([0, 1]),
        track_id=np.array([3, -1]),
        orig_shape=(64, 80),
        path="frame_000.jpg",
        names={0: "person", 1: "car"},
        orig_img=img)


def test_plot_option_toggles():
    r = _res()
    full = r.plot()
    no_boxes = r.plot(boxes=False, show_labels=False)
    np.testing.assert_array_equal(no_boxes, r.orig_img)  # nothing drawn
    assert (full != no_boxes).any()
    # conf digits add drawn pixels vs label-only
    lab = r.plot(boxes=False, show_conf=False)
    lab_conf = r.plot(boxes=False, show_conf=True)
    assert (lab != lab_conf).any()


def test_save_and_save_crop(tmp_path):
    r = _res()
    out = r.save(tmp_path / "vis" / "f.jpg")
    assert (tmp_path / "vis" / "f.jpg").exists(), out
    r.save_crop(tmp_path / "crops")
    person = list((tmp_path / "crops" / "person").glob("*.jpg"))
    car = list((tmp_path / "crops" / "car").glob("*.jpg"))
    assert len(person) == 1 and len(car) == 1
    from PIL import Image
    w, h = Image.open(person[0]).size
    # box 20x30 padded ~2% and clipped
    assert 19 <= w <= 23 and 29 <= h <= 33


def test_save_crop_no_image_is_noop(tmp_path):
    _res(with_img=False).save_crop(tmp_path / "c")
    assert not (tmp_path / "c").exists()


def test_vid_stride(monkeypatch):
    """VideoSource with vid_stride=2 yields every other decoded frame."""
    import shutil
    import subprocess
    from mo_yolo_tpu.data import loaders

    w, h, n = 6, 4, 7
    frames = np.stack([np.full((h, w, 3), i, np.uint8) for i in range(n)])

    src = loaders.VideoSource.__new__(loaders.VideoSource)
    src.path, src.w, src.h, src.n_frames = "fake.mp4", w, h, n
    src.vid_stride = 2

    class FakeProc:
        stdout = io.BytesIO(frames.tobytes())

        def wait(self):
            return 0

    monkeypatch.setattr(subprocess, "Popen",
                        lambda *a, **k: FakeProc())
    got = list(src)
    assert len(got) == len(src) == 4          # ceil(7/2)
    assert [int(f[0, 0, 0]) for _, f in got] == [0, 2, 4, 6]
    assert [p.split("#")[1] for p, _ in got] == \
        ["000000", "000002", "000004", "000006"]


def test_agnostic_nms():
    import jax.numpy as jnp
    from mo_yolo_tpu.models.detect import nms_fixed

    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0],
                       [1.0, 1.0, 11.0, 11.0],
                       [50.0, 50.0, 60.0, 60.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    cls = jnp.array([0, 1, 0])
    # class-aware: overlapping boxes of DIFFERENT classes both survive
    *_, valid = nms_fixed(boxes, scores, cls, iou_thresh=0.5,
                          conf_thresh=0.1, max_det=4)
    assert int(valid.sum()) == 3
    # agnostic: the lower-scored overlap is suppressed across classes
    *_, valid_a = nms_fixed(boxes, scores, cls, iou_thresh=0.5,
                            conf_thresh=0.1, max_det=4, agnostic=True)
    assert int(valid_a.sum()) == 2


def test_predictor_save_pipeline(tmp_path):
    """End-to-end: api.predict(save=True, save_crop=True) writes annotated
    frames and crops from an ndarray source through the tiny model."""
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32")
    frames = np.random.default_rng(1).uniform(
        0, 255, (2, 64, 64, 3)).astype(np.uint8)
    out = list(m.predict(frames, conf=0.0, save=True,
                         save_dir=str(tmp_path), save_crop=True,
                         line_width=1))
    assert len(out) == 2
    saved = list(tmp_path.glob("*.jpg"))
    assert len(saved) == 2, saved


def test_fuse_is_identity_surface():
    """`model.fuse()` (reference `BaseModel.fuse`, nn/tasks.py:122-147)
    returns self on every facade without touching weights — under XLA
    conv+BN fusion happens at jit compile time, so reference user code
    `model.fuse().predict(...)` must work verbatim."""
    import jax
    from mo_yolo_tpu.api import MOTRTrack, YOLO

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=0)
    before = jax.tree.leaves(m.variables)
    assert m.fuse() is m
    after = jax.tree.leaves(m.variables)
    assert all(np.array_equal(a, b) for a, b in zip(before, after))
    det = YOLO("tests/tiny_track.yaml", task="detect", imgsz=64,
               dtype="float32")
    assert det.fuse(verbose=False) is det
