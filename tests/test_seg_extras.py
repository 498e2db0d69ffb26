"""Segment-surface extras added for reference config-key parity:
`retina_masks` (ops.process_mask_native path), `mask_ratio` and
`overlap_mask` (v8 segment trainer keys, reference `cfg/default.yaml`).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402


def tiny_spec():
    from mo_yolo_tpu.models.graph import parse_model_yaml
    return parse_model_yaml("tests/tiny_track.yaml", nc=2)


def _seg_model(**kw):
    from mo_yolo_tpu.models.heads_extra import SegmentationModel
    m = SegmentationModel(spec=tiny_spec(), max_det=8, **kw)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return m, v


def test_compose_masks_default_and_retina():
    """Both paths return input-res [B,S,H,W] masks zeroed outside the
    box; retina path composes at native res (reference
    process_mask_native) so values inside may differ slightly."""
    m, v = _seg_model()
    mr, _ = _seg_model(retina_masks=True)
    coef = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    protos = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 32))
    boxes = jnp.tile(jnp.asarray([[8.0, 8.0, 40.0, 48.0]]), (8, 1))[None]
    for model, pad in ((m, 4), (mr, 0)):
        # default path crops at proto res then upsamples, so (like the
        # reference process_mask) bilinear bleeds <=1 proto cell (4 px)
        # past the box; the retina path crops at native res -> exact
        out = np.asarray(model.apply(v, boxes, coef, protos,
                                     method=model.compose_masks))
        assert out.shape == (1, 8, 64, 64)
        assert (out >= 0).all() and (out <= 1).all()
        assert out[:, :, :, 41 + pad:].max() == 0.0  # right of x2
        assert out[:, :, 49 + pad:, :].max() == 0.0  # below y2
        assert out[:, :, :7 - pad, :].max() == 0.0   # above y1
        # inside the box there is signal
        assert out[:, :, 20:40, 12:36].max() > 0.1


def test_compose_masks_paths_agree_coarsely():
    """Default (compose at proto res, upsample) and retina (upsample
    protos, compose) must agree on smooth inputs."""
    m, v = _seg_model()
    mr, _ = _seg_model(retina_masks=True)
    coef = jnp.ones((1, 4, 32)) * 0.1
    yy = jnp.linspace(-1, 1, 16)[None, :, None, None]
    protos = jnp.tile(yy, (1, 1, 16, 32))
    boxes = jnp.tile(jnp.asarray([[4.0, 4.0, 60.0, 60.0]]), (4, 1))[None]
    a = np.asarray(m.apply(v, boxes, coef, protos, method=m.compose_masks))
    b = np.asarray(mr.apply(v, boxes, coef, protos,
                            method=mr.compose_masks))
    assert np.abs(a[:, :, 8:56, 8:56] - b[:, :, 8:56, 8:56]).max() < 0.05


def test_seg_dataset_mask_ratio_and_overlap(tmp_path):
    """mask_ratio sets GT mask resolution; overlap_mask resolves
    overlapping instances so the smaller one owns the contested pixels
    (reference polygons2masks_overlap sort-by-area semantics)."""
    from PIL import Image
    from mo_yolo_tpu.train.task_trainers import SegDataset

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(
        tmp_path / "images" / "0.jpg")
    # big square covering most of the image + small square inside it
    (tmp_path / "labels" / "0.txt").write_text(
        "0 0.1 0.1 0.9 0.1 0.9 0.9 0.1 0.9\n"
        "1 0.4 0.4 0.6 0.4 0.6 0.6 0.4 0.6\n")
    f = [str(tmp_path / "images" / "0.jpg")]

    ds2 = SegDataset(f, imgsz=64, max_gt=4, mask_ratio=2)
    _, _, _, _, masks = ds2.load(0)
    assert masks.shape == (4, 32, 32)

    ds = SegDataset(f, imgsz=64, max_gt=4, overlap_mask=True)
    _, _, _, mvalid, masks = ds.load(0)
    assert masks.shape == (4, 16, 16)
    assert mvalid[:2].all()
    # contested center pixels belong to the SMALL instance only
    assert masks[1][7:9, 7:9].all()
    assert masks[0][7:9, 7:9].max() == 0.0
    # without overlap resolution both cover the center
    dsn = SegDataset(f, imgsz=64, max_gt=4, overlap_mask=False)
    _, _, _, _, mn = dsn.load(0)
    assert mn[0][7:9, 7:9].all() and mn[1][7:9, 7:9].all()


def test_seg_trainer_mask_ratio_step(tmp_path):
    """SegTrainer with mask_ratio=2 resizes GT masks to proto res inside
    the jitted loss and still produces a finite loss."""
    from PIL import Image
    from mo_yolo_tpu.models.heads_extra import SegmentationModel
    from mo_yolo_tpu.train.task_trainers import SegTrainer

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    files = []
    for i in range(2):
        p = tmp_path / "images" / f"{i}.jpg"
        Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(p)
        files.append(f"images/{i}.jpg")
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    (tmp_path / "train.txt").write_text("\n".join(files))
    y = tmp_path / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(tmp_path), "train": "train.txt", "val": "train.txt",
        "names": {0: "a", 1: "b"}}))

    model = SegmentationModel(spec=tiny_spec(), max_det=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    t = SegTrainer(model, v, str(y), epochs=1, batch=2, imgsz=64,
                   max_gt=4, save_dir=str(tmp_path / "run"),
                   mask_ratio=2, log_every=1)
    out = t.run()
    assert np.isfinite(out["final_loss"])


def test_task_results_surface(tmp_path):
    """as_results=True yields reference-style Results with masks /
    keypoints / probs and a plot() that overlays them."""
    from PIL import Image
    from mo_yolo_tpu.api import YOLO

    img = np.zeros((80, 96, 3), np.uint8)
    img[20:60, 30:70] = 200
    p = tmp_path / "a.jpg"
    Image.fromarray(img).save(p)

    seg = YOLO("tests/tiny_track.yaml", task="segment", nc=2, imgsz=64)
    for _, r in seg.predict(str(p), as_results=True):
        assert r.orig_shape == (80, 96)
        assert r.masks is not None and r.masks.shape[1:] == (64, 64)
        assert len(r.masks) == len(r)
        rendered = r.plot()
        assert rendered.shape == (80, 96, 3)

    pose = YOLO("tests/tiny_track.yaml", task="pose", nc=1,
                imgsz=64, kpt_shape=(17, 3))
    for _, r in pose.predict(str(p), as_results=True):
        assert r.keypoints is not None and r.keypoints.shape[1:] == (17, 3)
        assert r.plot(kpt_line=True).shape == (80, 96, 3)

    cls = YOLO("tests/tiny_track.yaml", task="classify", nc=2, imgsz=64)
    for _, r in cls.predict(str(p), as_results=True):
        assert r.probs is not None and len(r.probs) == 2
        np.testing.assert_allclose(r.probs.sum(), 1.0, rtol=1e-5)
        assert r.plot().shape == (80, 96, 3)


def test_save_txt_task_variants(tmp_path):
    """save_txt row formats per task (reference Results.save_txt):
    segment = cls + normalized polygon, pose = cls + xywhn + kpts."""
    from mo_yolo_tpu.engine.results import TrackResults

    mk = np.zeros((64, 64))
    mk[10:30, 20:40] = 1.0
    base = dict(boxes_xyxy=np.asarray([[20.0, 10.0, 40.0, 30.0]]),
                conf=np.asarray([0.9]), cls=np.asarray([0]),
                track_id=np.asarray([-1]), orig_shape=(64, 64))
    TrackResults(**base, masks=mk[None]).save_txt(
        tmp_path / "seg.txt", save_conf=True)
    row = (tmp_path / "seg.txt").read_text().split()
    assert row[0] == "0" and abs(float(row[-1]) - 0.9) < 1e-6
    xs = np.asarray(row[1:-1], np.float32)
    assert len(xs) >= 8 and xs.min() >= 0 and xs.max() <= 1

    kp = np.zeros((1, 17, 3))
    kp[0, :, 0], kp[0, :, 1], kp[0, :, 2] = 32, 16, 2
    TrackResults(**base, keypoints=kp[0][None]).save_txt(
        tmp_path / "kpt.txt")
    row2 = (tmp_path / "kpt.txt").read_text().split()
    assert len(row2) == 1 + 4 + 51


def test_info_profile_layers():
    """info(profile=True): per-node ms + GFLOPs over the CNN graph
    (reference `_profile_one_layer` surface)."""
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=4)
    rows = m.info(profile=True, verbose=False)["layers_profile"]
    assert len(rows) == len(m.model.spec.nodes)
    assert all(r["ms"] >= 0 and r["gflops"] >= 0 for r in rows)
    assert sum(r["gflops"] for r in rows) > 0
    assert rows[-1]["cum_ms"] >= rows[0]["cum_ms"] * 0  # monotone field set
