"""`visualize` feature-map dumps and `save_hybrid` auto-label txts
(reference `utils/plotting.py:497-524` feature_visualization and the
validator's save_hybrid lb path)."""

import numpy as np


def test_feature_visualization_grids(tmp_path):
    from mo_yolo_tpu.utils.plotting import feature_visualization

    feats = [np.random.default_rng(0).normal(size=(1, 8, 8, 16)),
             np.random.default_rng(1).normal(size=(1, 4, 4, 40))]
    paths = feature_visualization(feats, str(tmp_path), n=32)
    assert len(paths) == 2
    from PIL import Image
    g0 = np.asarray(Image.open(paths[0]))
    assert g0.shape == (2 * 8, 8 * 8)          # 16 ch -> 2 rows of 8
    g1 = np.asarray(Image.open(paths[1]))
    assert g1.shape == (4 * 4, 8 * 4)          # 32-of-40 ch -> 4 rows
    # degenerate 1x1 maps are skipped like the reference
    assert feature_visualization(
        [np.zeros((1, 1, 1, 4))], str(tmp_path)) == []


def test_predict_visualize_writes_stages(tmp_path):
    from PIL import Image
    from mo_yolo_tpu.api import MOTRTrack

    img = np.full((64, 64, 3), 60, np.uint8)
    img[20:44, 20:44, 2] = 255
    paths = []
    for t in range(2):
        p = tmp_path / f"{t:06d}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64, dtype="float32",
                  nq=8, ndl=1, d_ffn=32, hd=32, num_denoising=0)
    list(m.predict(paths, conf=0.0, visualize=True,
                   save_dir=str(tmp_path / "viz")))
    stages = sorted((tmp_path / "viz").glob("**/stage*_features.png"))
    assert stages, "visualize=True wrote no feature grids"
    # one subdir per FRAME (regression: every frame used to overwrite the
    # same stage{N}_features.png paths)
    frame_dirs = {s.parent for s in stages}
    assert len(frame_dirs) == 2, frame_dirs


def test_val_save_hybrid_labels(tmp_path):
    from PIL import Image
    from mo_yolo_tpu.api import Detector

    img_dir = tmp_path / "images" / "s01"
    lab_dir = tmp_path / "labels" / "s01"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    img = np.full((64, 64, 3), 90, np.uint8)
    img[20:40, 20:40, 0] = 250
    Image.fromarray(img).save(img_dir / "000007.png")
    (lab_dir / "000007.txt").write_text("1 0.469 0.469 0.312 0.312 0\n")

    det = Detector("tests/tiny_track.yaml", nc=2, imgsz=64,
                   dtype="float32")
    det.val([str(img_dir / "000007.png")], max_gt=4, save_hybrid=True,
            save_dir=str(tmp_path / "v"))
    txt = (tmp_path / "v" / "labels" / "000007.txt").read_text()
    rows = [r.split() for r in txt.strip().splitlines()]
    assert rows, "hybrid label file empty"
    # first row is the GT box, normalized cls cx cy w h
    assert rows[0][0] == "1"
    assert abs(float(rows[0][1]) - 0.469) < 1e-3
    for r in rows:
        assert len(r) == 5
        assert all(0.0 <= float(v) <= 1.0 for v in r[1:])
