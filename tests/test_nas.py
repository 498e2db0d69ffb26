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


@pytest.mark.parametrize("hw", [(64, 96), (72, 100)])
def test_tta_geometry_and_merge(tmp_path, hw):
    """predict_step_tta (reference `_predict_augment`, tasks.py:258-295):
    a deterministic fake head returns shape-relative boxes regardless of
    content, isolating the TTA geometry — resize, de-flip, de-scale,
    tail clipping, union NMS. A symmetric box must merge to ONE
    detection across all passes; an x-asymmetric box must additionally
    appear mirrored from the flipped pass. The (72, 100) case covers
    inputs that are NOT stride-32 multiples (ceil-grid anchor counts,
    exact full-scale pass)."""
    import jax
    import jax.numpy as jnp
    import yaml

    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.nas import NASModel

    class FakeDet(NASModel):
        def setup(self):   # no params: __call__ never runs the graph
            pass

        def __call__(self, images, train=False, raw=False):
            B, hi, wi, _ = images.shape
            # SAME-padded stride chains give ceil(h/s) grids
            S = sum((-(-hi // s)) * (-(-wi // s))
                    for s in self.spec.out_strides)
            boxes = jnp.zeros((B, S, 4))
            cls = jnp.full((B, S, self.spec.nc), 1e-6)
            sym = jnp.asarray([0.25 * wi, 0.25 * hi, 0.75 * wi, 0.75 * hi])
            asym = jnp.asarray([0.1 * wi, 0.4 * hi, 0.3 * wi, 0.6 * hi])
            boxes = boxes.at[:, 0].set(sym).at[:, 1].set(asym)
            cls = cls.at[:, 0, 0].set(0.9).at[:, 1, 1].set(0.8)
            return boxes, cls

    cfg = tmp_path / "tiny_nas.yaml"
    cfg.write_text(yaml.safe_dump(TINY_NAS))
    m = FakeDet(spec=parse_model_yaml(str(cfg)), max_det=8, conf=0.1)
    img = jnp.zeros((1, hw[0], hw[1], 3))
    v = m.init(jax.random.PRNGKey(0), img, method=m.predict_step_tta)
    boxes, scores, cls = jax.jit(
        lambda x: m.apply(v, x, method=m.predict_step_tta))(img)
    assert boxes.shape == (1, 8, 4)
    b = np.asarray(boxes[0])
    s = np.asarray(scores[0])
    c = np.asarray(cls[0])
    live = s > 0.1
    # class 0 (x-symmetric): identical from every contributing pass ->
    # NMS merges to exactly one box at cxcywh (0.5, 0.5, 0.5, 0.5)
    c0 = live & (c == 0)
    assert c0.sum() == 1
    np.testing.assert_allclose(b[c0][0], [0.5, 0.5, 0.5, 0.5], atol=0.02)
    # class 1 (x-asymmetric): the direct passes give cx=0.2, the flipped
    # pass de-flips to the mirror cx=0.8 -> two disjoint detections
    c1 = live & (c == 1)
    cx = np.sort(b[c1][:, 0])
    assert c1.sum() == 2
    np.testing.assert_allclose(cx, [0.2, 0.8], atol=0.02)
    # heights/widths survive the per-axis de-scale
    np.testing.assert_allclose(b[c1][:, 2:], [[0.2, 0.2], [0.2, 0.2]],
                               atol=0.02)
