"""CLI routing for the last reference config keys (device/amp/dnn/
workers/show/boxes/profile + export knobs) and the segment/pose/classify
task commands (`yolo segment train ...`, reference cfg entrypoint)."""

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")


def _track_dataset(root, n=3):
    from PIL import Image
    (root / "images/seq01").mkdir(parents=True)
    (root / "labels/seq01").mkdir(parents=True)
    files = []
    for t in range(n):
        img = np.full((64, 64, 3), 70, np.uint8)
        img[20:40, 20:40] = 220
        p = root / "images/seq01" / f"{t:03d}.jpg"
        Image.fromarray(img).save(p)
        (root / "labels/seq01" / f"{t:03d}.txt").write_text(
            "0 1 0.45 0.45 0.3 0.3\n")
        files.append(f"images/seq01/{t:03d}.jpg")
    (root / "train.txt").write_text("\n".join(files))
    y = root / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(root), "train": "train.txt", "val": "train.txt",
        "names": {0: "thing"}}))
    return y, root / "images/seq01"


def _seg_dataset(root):
    from PIL import Image
    (root / "images").mkdir()
    (root / "labels").mkdir()
    files = []
    for i in range(2):
        p = root / "images" / f"{i}.jpg"
        Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(p)
        files.append(f"images/{i}.jpg")
        (root / "labels" / f"{i}.txt").write_text(
            "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    (root / "train.txt").write_text("\n".join(files))
    y = root / "d.yaml"
    y.write_text(yaml.safe_dump({
        "path": str(root), "train": "train.txt", "val": "train.txt",
        "names": {0: "a", 1: "b"}}))
    return y, root / "images"


def test_predict_accepts_global_keys(tmp_path):
    """device=cpu, amp=False, dnn=True, workers=1, show=True, boxes=False
    all route through one predict call without error."""
    from mo_yolo_tpu.cli import main

    _, imgdir = _track_dataset(tmp_path)
    rc = main(["track", "predict", "model=tests/tiny_track.yaml",
               f"source={imgdir}", "imgsz=64", "device=cpu", "amp=False",
               "dnn=True", "workers=1", "show=True", "boxes=False",
               "save=True", f"save_dir={tmp_path}/out"])
    assert rc == 0
    assert list((tmp_path / "out").glob("*.jpg"))


def test_export_knobs_route_from_cli(tmp_path, monkeypatch):
    from mo_yolo_tpu.cli import main

    monkeypatch.chdir(tmp_path)
    rc = main(["track", "export", "model=tests/tiny_track.yaml".replace(
        "tests/", "/root/repo/tests/"), "imgsz=64", "format=params",
        "path=wexp", "half=True", "simplify=True"])
    assert rc == 0
    assert (tmp_path / "wexp").exists()


def test_cli_segment_train_val_predict(tmp_path):
    from mo_yolo_tpu.cli import main

    y, imgdir = _seg_dataset(tmp_path)
    rc = main(["segment", "train", "model=tests/tiny_track.yaml", "nc=2",
               f"data={y}", "imgsz=64", "epochs=1", "batch=2", "max_gt=4",
               "mask_ratio=2", f"project={tmp_path}", "name=segrun"])
    assert rc == 0
    rc = main(["segment", "val", "model=tests/tiny_track.yaml", "nc=2",
               f"data={y}", "imgsz=64"])
    assert rc == 0
    rc = main(["segment", "predict", "model=tests/tiny_track.yaml", "nc=2",
               f"source={imgdir}", "imgsz=64", "retina_masks=True"])
    assert rc == 0


def test_cli_classify_predict(tmp_path):
    from PIL import Image
    from mo_yolo_tpu.cli import main

    (tmp_path / "imgs").mkdir()
    Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(
        tmp_path / "imgs" / "x.jpg")
    rc = main(["classify", "predict", "model=tests/tiny_track.yaml",
               "nc=2", f"source={tmp_path}/imgs", "imgsz=64"])
    assert rc == 0


def test_default_yaml_covers_reference_keys():
    """Every key in the reference default.yaml now exists in ours."""
    ours = set(yaml.safe_load(
        open("mo_yolo_tpu/cfg/default.yaml")))
    ref = set(yaml.safe_load(
        open("/root/reference/ultralytics/cfg/default.yaml")))
    missing = ref - ours
    assert not missing, sorted(missing)


def test_cli_track_mode(tmp_path):
    """Reference `yolo track` mode: detect task -> classic tracker,
    track task -> the streaming MOTR predictor."""
    from PIL import Image
    from mo_yolo_tpu.cli import main

    (tmp_path / "seq").mkdir()
    for t in range(2):
        img = np.full((64, 64, 3), 70, np.uint8)
        img[20:40, 20:40] = 220
        Image.fromarray(img).save(tmp_path / "seq" / f"{t:03d}.jpg")
    rc = main(["detect", "track", "model=tests/tiny_detr.yaml",
               f"source={tmp_path}/seq", "imgsz=64", "tracker=bytetrack"])
    assert rc == 0
    rc = main(["track", "track", "model=tests/tiny_track.yaml",
               f"source={tmp_path}/seq", "imgsz=64"])
    assert rc == 0


def test_tracker_yaml_config(tmp_path):
    """`tracker=` accepts bundled and custom tracker yamls (reference
    cfg/trackers/*.yaml + trackers/track.py check_yaml)."""
    from PIL import Image
    from mo_yolo_tpu.api import Detector

    (tmp_path / "seq").mkdir()
    for t in range(2):
        img = np.full((64, 64, 3), 70, np.uint8)
        img[20:40, 20:40] = 220
        Image.fromarray(img).save(tmp_path / "seq" / f"{t:03d}.jpg")
    m = Detector("tests/tiny_detr.yaml", imgsz=64)
    assert sum(1 for _ in m.track(str(tmp_path / "seq"),
                                  tracker="botsort.yaml")) == 2
    cy = tmp_path / "custom.yaml"
    cy.write_text(yaml.safe_dump({"tracker_type": "bytetrack",
                                  "track_buffer": 5,
                                  "match_thresh": 0.7}))
    assert sum(1 for _ in m.track(str(tmp_path / "seq"),
                                  tracker=str(cy))) == 2
