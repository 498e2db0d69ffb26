"""Numeric parity of the v8 task losses vs the torch reference
criterions (`ultralytics/utils/loss.py`: v8DetectionLoss `:130-227`,
v8PoseLoss `:324-409`, v8ClassificationLoss `:412-419`).

Builds the REAL reference model (BN-warmed random init), imports its
weights into our stack (forward parity proven in
test_torch_v8_parity.py), runs BOTH frameworks' criterions on the same
image + the same GT, and compares the per-component losses. This pins
the TaskAlignedAssigner + CIoU + DFL chain, not just the forward.
"""


import pytest

# heavy tier (round-4 VERDICT weak #7): multi-minute reference-torch
# comparison; run with --runheavy / --runall
pytestmark = pytest.mark.heavy
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import yaml  # noqa: E402

torch = pytest.importorskip("torch")

from tests.torch_ref import load_reference  # noqa: E402

V8_CFG = "/root/reference/ultralytics/cfg/models/v8"


@pytest.fixture(scope="module")
def ref():
    try:
        return load_reference()
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference tree not importable: {e}")


def _image():
    yy, xx = np.mgrid[0:160, 0:160].astype(np.float32) / 160.0
    img = np.stack([xx, yy, xx * yy], -1)[None].astype(np.float32)
    img[0, 40:80, 30:70, 0] = 1.0
    img[0, 90:140, 80:150, 1] = 0.0
    return img


# well-separated GT (normalized cxcywh) to keep TAL assignment unambiguous
GT_XYWHN = np.asarray([[0.30, 0.35, 0.22, 0.28],
                       [0.72, 0.70, 0.35, 0.30]], np.float32)
GT_CLS = np.asarray([1, 4], np.int64)


def _gt_ours(imgsz=160.0, max_gt=4):
    cx, cy, w, h = (GT_XYWHN * imgsz).T
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
    gl = np.zeros((1, max_gt), np.int32)
    gb = np.zeros((1, max_gt, 4), np.float32)
    gm = np.zeros((1, max_gt), bool)
    gl[0, :2] = GT_CLS
    gb[0, :2] = xyxy
    gm[0, :2] = True
    return jnp.asarray(gl), jnp.asarray(gb), jnp.asarray(gm)


def _batch_torch(nc_extra=None):
    b = {"batch_idx": torch.zeros(2),
         "cls": torch.from_numpy(GT_CLS.astype(np.float32)).view(-1, 1),
         "bboxes": torch.from_numpy(GT_XYWHN)}
    if nc_extra:
        b.update(nc_extra)
    return b


def _build_ref(ref, cls, cfgname, nc, **kw):
    from types import SimpleNamespace
    torch.manual_seed(0)
    m = cls(cfg=cfgname, verbose=False, nc=nc, **kw).float()
    m.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0,
                             label_smoothing=0.0)
    m.train()
    with torch.no_grad():
        m(torch.rand(2, 3, 160, 160,
                     generator=torch.Generator().manual_seed(1)))
    return m


def _import_ours(cfgpath, nc, Model, sd, scale=None, **kw):
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.utils.checkpoint import apply_torch_state_dict

    with open(cfgpath) as f:
        cfg = yaml.safe_load(f)
    cfg["nc"] = nc
    if scale:
        cfg["scale"] = scale
    m = Model(spec=parse_model_yaml(cfg), **kw)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3)))
    v2, rep = apply_torch_state_dict(sd, v, strict=True)
    assert not rep["untouched"], rep["untouched"][:10]
    return m, v2


def test_detect_loss_parity(ref):
    """box/cls/dfl items of v8DetectionLoss == ours on the same forward."""
    from mo_yolo_tpu.models.nas import NASModel
    from mo_yolo_tpu.train.v8_loss import V8LossConfig, v8_detection_loss

    dm = _build_ref(ref, ref.tasks.DetectionModel, "yolov8n.yaml", nc=8)
    crit = dm.init_criterion()
    sd = {k: v.float().numpy() for k, v in dm.state_dict().items()}
    m, v = _import_ours(f"{V8_CFG}/yolov8.yaml", 8, NASModel, sd, scale="n")

    img = _image()
    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    dm.eval()   # deterministic BN; criterion math is mode-independent
    with torch.no_grad():
        feats = dm(timg)
        feats = feats[1] if isinstance(feats, tuple) else feats
        _, items = crit(feats, _batch_torch())
    tbox, tcls, tdfl = (float(x) for x in items)

    box_dist, cls_logits, anc, strides = m.apply(v, jnp.asarray(img),
                                                 False, True)
    losses = v8_detection_loss(V8LossConfig(nc=8), box_dist, cls_logits,
                               anc, strides, *_gt_ours())
    # reference items are already gain-multiplied; ours are raw components
    np.testing.assert_allclose(7.5 * float(losses["box"]), tbox, rtol=2e-3)
    np.testing.assert_allclose(0.5 * float(losses["cls"]), tcls, rtol=2e-3)
    np.testing.assert_allclose(1.5 * float(losses["dfl"]), tdfl, rtol=2e-3)


def test_pose_loss_parity(ref):
    """v8PoseLoss items (box/pose/kobj/cls/dfl) == ours."""
    from mo_yolo_tpu.models.heads_extra import PoseModel
    from mo_yolo_tpu.train.v8_loss import V8LossConfig, v8_pose_loss

    pm = _build_ref(ref, ref.tasks.PoseModel, "yolov8n-pose.yaml", nc=1,
                    data_kpt_shape=(17, 3))
    crit = pm.init_criterion()
    sd = {k: v.float().numpy() for k, v in pm.state_dict().items()}
    m, v = _import_ours(f"{V8_CFG}/yolov8-pose.yaml", 1, PoseModel, sd,
                        scale="n", kpt_shape=(17, 3))

    rng = np.random.default_rng(3)
    kpts = np.zeros((2, 17, 3), np.float32)
    for gi in range(2):
        cx, cy, w, h = GT_XYWHN[gi]
        kpts[gi, :, 0] = rng.uniform(cx - w / 3, cx + w / 3, 17)
        kpts[gi, :, 1] = rng.uniform(cy - h / 3, cy + h / 3, 17)
        kpts[gi, :, 2] = 2.0   # visible
    batch = _batch_torch({"keypoints": torch.from_numpy(kpts),
                          "cls": torch.zeros(2, 1)})

    img = _image()
    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    pm.eval()
    with torch.no_grad():
        feats = pm(timg)
        feats = feats[1] if isinstance(feats, tuple) else feats
        _, items = crit(feats, batch)
    tbox, tpose, tkobj, tcls, tdfl = (float(x) for x in items)

    out = m.apply(v, jnp.asarray(img), False, True)
    box_dist, cls_logits, anc, strides, kpt_pred = out
    gl, gb, gm = _gt_ours()
    gl = gl * 0
    gk = np.zeros((1, 4, 17, 3), np.float32)
    gk[0, :2] = kpts
    gk[0, :2, :, :2] *= 160.0
    losses = v8_pose_loss(V8LossConfig(nc=1), box_dist, cls_logits, anc,
                          strides, kpt_pred, gl, gb, gm,
                          jnp.asarray(gk))
    np.testing.assert_allclose(7.5 * float(losses["box"]), tbox, rtol=2e-3)
    np.testing.assert_allclose(0.5 * float(losses["cls"]), tcls, rtol=2e-3)
    np.testing.assert_allclose(1.5 * float(losses["dfl"]), tdfl, rtol=2e-3)
    np.testing.assert_allclose(12.0 * float(losses["pose"]), tpose,
                               rtol=5e-3)
    np.testing.assert_allclose(1.0 * float(losses["kobj"]), tkobj,
                               rtol=5e-3)


def test_segment_loss_parity(ref):
    """v8SegmentationLoss items (box/seg/cls/dfl) == ours, including the
    per-image unweighted fg-mean + box-gain normalization of the seg
    term (`loss.py:313` loss[1] *= hyp.box / batch_size)."""
    from mo_yolo_tpu.models.heads_extra import SegmentationModel
    from mo_yolo_tpu.train.v8_loss import (V8LossConfig,
                                           v8_segmentation_loss)

    sm = _build_ref(ref, ref.tasks.SegmentationModel, "yolov8n-seg.yaml",
                    nc=8)
    sm.args.overlap_mask = False
    crit = sm.init_criterion()
    sd = {k: v.float().numpy() for k, v in sm.state_dict().items()}
    m, v = _import_ours(f"{V8_CFG}/seg/yolov8n-seg.yaml", 8,
                        SegmentationModel, sd)

    # GT masks at proto res (40x40 for 160 input): filled boxes
    gmask = np.zeros((2, 40, 40), np.float32)
    for gi in range(2):
        x1, y1, x2, y2 = (np.concatenate(
            [GT_XYWHN[gi, :2] - GT_XYWHN[gi, 2:] / 2,
             GT_XYWHN[gi, :2] + GT_XYWHN[gi, 2:] / 2]) * 40).astype(int)
        gmask[gi, y1:y2, x1:x2] = 1.0
    batch = _batch_torch({"masks": torch.from_numpy(gmask)})

    img = _image()
    timg = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
    sm.eval()
    with torch.no_grad():
        preds = sm(timg)
        preds = preds if len(preds) == 3 else preds[1]
        _, items = crit(preds, batch)
    tbox, tseg, tcls, tdfl = (float(x) for x in items)

    out = m.apply(v, jnp.asarray(img), False, True)
    box_dist, cls_logits, anc, strides, coef, protos = out
    gm4 = np.zeros((1, 4, 40, 40), np.float32)
    gm4[0, :2] = gmask
    losses = v8_segmentation_loss(V8LossConfig(nc=8), box_dist, cls_logits,
                                  anc, strides, coef, protos, *_gt_ours(),
                                  jnp.asarray(gm4), imgsz=160.0)
    np.testing.assert_allclose(7.5 * float(losses["box"]), tbox, rtol=2e-3)
    np.testing.assert_allclose(0.5 * float(losses["cls"]), tcls, rtol=2e-3)
    np.testing.assert_allclose(1.5 * float(losses["dfl"]), tdfl, rtol=2e-3)
    np.testing.assert_allclose(7.5 * float(losses["mask"]), tseg, rtol=5e-3)


def test_classify_loss_parity(ref):
    """v8ClassificationLoss is plain CE; ours must match exactly."""
    from mo_yolo_tpu.train.v8_loss import classification_loss

    logits = torch.randn(4, 8, generator=torch.Generator().manual_seed(2))
    labels = torch.tensor([1, 3, 0, 7])
    tloss = torch.nn.functional.cross_entropy(logits, labels,
                                              reduction="mean")
    ours = classification_loss(jnp.asarray(logits.numpy()),
                               jnp.asarray(labels.numpy()))
    ours = ours["loss"] if isinstance(ours, dict) else ours
    np.testing.assert_allclose(float(ours), float(tloss), rtol=1e-5)
