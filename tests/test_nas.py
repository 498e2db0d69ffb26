"""NAS family tests (reference `ultralytics/models/nas/`)."""

import os

import numpy as np
import pytest

TINY_NAS = {
    "nc": 3,
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 2, "RepConv", [32]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Conv", [64, 3, 2]],
    ],
    "head": [
        [[3, 4, 5], 1, "Detect", ["nc"]],
    ],
}


def test_yolo_nas_yaml_parses():
    from mo_yolo_tpu.models.graph import parse_model_yaml
    spec = parse_model_yaml("mo_yolo_tpu/cfg/models/yolo_nas_s.yaml")
    assert spec.nc == 80
    assert spec.out_strides == (8, 16, 32)
    assert any(n.module == "RepConv" for n in spec.nodes)
    # depth_multiple applies to the RepConv stage repeats
    rep = [n for n in spec.nodes if n.module == "RepConv"]
    assert all(n.repeats >= 1 for n in rep)


def test_nas_predict_and_nms(tmp_path):
    import jax.numpy as jnp
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.nas import NAS, NASModel

    import yaml
    cfg = tmp_path / "tiny_nas.yaml"
    cfg.write_text(yaml.safe_dump(TINY_NAS))
    nas = NAS(str(cfg), imgsz=64, max_det=8)
    info = nas.info()
    assert info["nc"] == 3 and info["strides"] == (8, 16, 32)

    img = (np.random.default_rng(0).uniform(0, 1, (50, 60, 3)) * 255
           ).astype(np.uint8)
    boxes, scores, cls = nas._step(nas.variables,
                                   jnp.zeros((1, 64, 64, 3)))
    assert boxes.shape == (1, 8, 4) and scores.shape == (1, 8)
    # suppressed slots are zero-scored; boxes are normalized cxcywh
    assert float(np.asarray(scores).min()) >= 0.0
    results = list(nas.predict([img], conf=0.0))
    assert len(results) == 1
    r = results[0]
    assert r.boxes_xyxy.shape[1] == 4
    assert (r.track_id == -1).all()


def test_nas_resolves_from_cfg_dir(tmp_path):
    """`NAS('yolo_nas_s.yaml')` resolves the packaged cfg like the other
    facades; parse-only (full init is slow on 1-core CPU)."""
    from mo_yolo_tpu.api import _resolve_model_cfg
    p = _resolve_model_cfg("yolo_nas_s.yaml")
    assert os.path.isfile(p)
