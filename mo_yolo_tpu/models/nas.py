"""YOLO-NAS family.

The reference NAS family (`ultralytics/models/nas/`) wraps an external
pretrained super-gradients supernet and adapts it to the predict/val
surface (`model.py:27-60`, `predict.py`: boxes arrive already-decoded
xyxy + per-class scores, then standard NMS). There is no in-repo
architecture, so the TPU-native equivalent is a first-class model:
`cfg/models/yolo_nas_s.yaml` (RepConv QSP/QCI stages, re-parameterizable
under XLA fusion) + the anchor-free `YoloDetectHead`, with the NMS run
ON DEVICE inside the jitted predict step (`detect.nms_fixed`) — the
whole frame pipeline is one compiled program with fixed output slots.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mo_yolo_tpu.models.detect import YoloDetectHead, nms_fixed
from mo_yolo_tpu.models.graph import BackboneNeck, GraphSpec, parse_model_yaml


class NASModel(nn.Module):
    """Backbone/neck graph + anchor-free detect head + on-device NMS."""

    spec: GraphSpec
    max_det: int = 300
    conf: float = 0.001
    iou: float = 0.7
    agnostic: bool = False   # cross-class suppression (reference agnostic_nms)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.head = YoloDetectHead(self.spec.nc, self.spec.out_strides,
                                   act=self.spec.act, dtype=self.dtype)

    def __call__(self, images, train: bool = False, raw: bool = False):
        feats = self.backbone(images, train=train)
        return self.head(feats, raw=raw)

    def predict_step(self, images):
        """One jitted step -> (boxes cxcywh [B,max_det,4] normalized,
        scores [B,max_det], cls [B,max_det]); suppressed slots have
        score 0. Matches `DetectionModel.predict_step`'s contract so the
        standalone `DetectionValidator` drives either family."""
        boxes, cls_p = self(images, train=False)     # xyxy px, [B,S,nc]
        return self._nms_norm(boxes, cls_p,
                              (images.shape[1], images.shape[2]))

    def _nms_norm(self, boxes, cls_p, img_hw):
        H, W = img_hw
        # per-axis normalization (rect inputs have H != W)
        sz = jnp.asarray([W, H], boxes.dtype)

        def one(b, c):
            bb, ss, cc, valid = nms_fixed(b, c.max(-1), jnp.argmax(c, -1),
                                          iou_thresh=self.iou,
                                          conf_thresh=self.conf,
                                          max_det=self.max_det,
                                          agnostic=self.agnostic)
            cxy = (bb[:, :2] + bb[:, 2:]) / 2 / sz
            wh = (bb[:, 2:] - bb[:, :2]) / sz
            return (jnp.concatenate([cxy, wh], -1), ss * valid,
                    cc.astype(jnp.int32))

        return jax.vmap(one)(boxes, cls_p)

    def predict_step_tta(self, images):
        """Test-time augmentation (reference
        `DetectionModel._predict_augment`, `nn/tasks.py:258-295`):
        forwards at scales 1 / 0.83 / 0.67 with an lr-flip on the middle
        scale, predictions de-flipped and de-scaled back to input pixels,
        the full-scale pass's P5 tail and the smallest pass's P3 head
        dropped (`_clip_augmented`), then ONE fixed-slot NMS over the
        union. TPU-native: every scale is a static stride-32 shape, the
        whole sweep compiles into one jitted step. Output contract equals
        `predict_step`."""
        B, H, W, _ = images.shape
        scales = (1.0, 0.83, 0.67)
        flips = (False, True, False)
        all_b, all_c = [], []
        for idx, (si, fl) in enumerate(zip(scales, flips)):
            if si == 1.0:                # full scale: exact input dims
                hi, wi, xi = H, W, images
            else:
                hi = max(int(round(H * si / 32)) * 32, 32)
                wi = max(int(round(W * si / 32)) * 32, 32)
                xi = jax.image.resize(
                    images, (B, hi, wi, images.shape[-1]), "bilinear")
            if fl:
                xi = xi[:, :, ::-1]
            b, c = self(xi, train=False)             # xyxy in scaled px
            if fl:                                   # de-flip lr
                b = jnp.stack([wi - b[..., 2], b[..., 1],
                               wi - b[..., 0], b[..., 3]], -1)
            if (hi, wi) != (H, W):
                # de-scale per axis (stride rounding makes sx != sy)
                b = b * jnp.asarray([W / wi, H / hi, W / wi, H / hi],
                                    b.dtype)
            # anchors are level-ordered P3|P4|P5 (YoloDetectHead concat);
            # SAME-padded stride-2 chains give ceil(h/s) grids, so use
            # ceil division for inputs that aren't stride multiples
            counts = [(-(-hi // s)) * (-(-wi // s))
                      for s in self.spec.out_strides]
            if idx == 0:                 # full scale: drop coarsest tail
                keep = sum(counts[:-1])
                b, c = b[:, :keep], c[:, :keep]
            if idx == len(scales) - 1:   # smallest: drop finest head
                b, c = b[:, counts[0]:], c[:, counts[0]:]
            all_b.append(b)
            all_c.append(c)
        return self._nms_norm(jnp.concatenate(all_b, 1),
                              jnp.concatenate(all_c, 1), (H, W))


from mo_yolo_tpu.api import _CallbackMixin  # noqa: E402


class NAS(_CallbackMixin):
    """Reference-shaped facade (`nas/model.py`): predict/val/export over
    a yolo_nas graph; weight loading comes from orbax params (no
    super-gradients checkpoints in a TPU deployment). Inherits the
    reference Model callback surface (add_callback / on_export_*) like
    every other facade."""

    def __init__(self, model: str = "yolo_nas_s.yaml", nc: Optional[int] = None,
                 imgsz: int = 640, dtype: str = "float32",
                 names: Optional[Dict[int, str]] = None, seed: int = 0,
                 max_det: int = 300):
        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
        from mo_yolo_tpu.api import _resolve_model_cfg
        self._cfg = _resolve_model_cfg(str(model))
        spec = parse_model_yaml(self._cfg, nc=nc)
        self.model = NASModel(spec=spec, dtype=jdt, max_det=max_det)
        self.imgsz = imgsz
        self.names = names or {}
        self.task = "detect"
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, imgsz, imgsz, 3)))
        self._step = jax.jit(lambda v, x: self.model.apply(
            v, x, method=self.model.predict_step))
        self._step_tta = None

    def predict(self, source, conf: float = 0.25, augment: bool = False):
        """augment=True runs the 3-scale + flip TTA sweep (reference
        `predict(augment=True)` -> `_predict_augment`)."""
        from mo_yolo_tpu.data.letterbox import boxes_to_original, preprocess
        from mo_yolo_tpu.data.loaders import make_source
        from mo_yolo_tpu.engine.results import TrackResults

        step = self._step
        if augment:
            if self._step_tta is None:
                self._step_tta = jax.jit(lambda v, x: self.model.apply(
                    v, x, method=self.model.predict_step_tta))
            step = self._step_tta
        for path, img in make_source(source):
            x, meta = preprocess(img, self.imgsz, scale_fill=True)
            boxes, scores, cls = step(self.variables, jnp.asarray(x))
            b = np.asarray(boxes[0], np.float32)
            s = np.asarray(scores[0], np.float32)
            c = np.asarray(cls[0])
            keep = s >= conf
            size = self.imgsz
            xyxy = np.stack([(b[:, 0] - b[:, 2] / 2) * size,
                             (b[:, 1] - b[:, 3] / 2) * size,
                             (b[:, 0] + b[:, 2] / 2) * size,
                             (b[:, 1] + b[:, 3] / 2) * size], 1)[keep]
            yield TrackResults(boxes_xyxy=boxes_to_original(xyxy, meta),
                               conf=s[keep], cls=c[keep].astype(int),
                               track_id=np.full(int(keep.sum()), -1),
                               orig_shape=meta["orig_shape"], path=path,
                               names=self.names, orig_img=img)

    __call__ = predict

    def val(self, data, max_gt: int = 64) -> Dict[str, float]:
        from mo_yolo_tpu.engine.validator import DetectionValidator

        if isinstance(data, str):
            from mo_yolo_tpu.data.dataset import load_dataset_yaml
            d = load_dataset_yaml(data)
            files = d["val"]
            self.names = self.names or d["names"]
        else:
            files = list(data)
        v = DetectionValidator(self.model, self.variables, imgsz=self.imgsz,
                               conf=0.001)
        return v(files, max_gt=max_gt)

    def info(self):
        n = sum(x.size for x in jax.tree.leaves(self.variables))
        return {"params": int(n), "nc": self.model.spec.nc,
                "strides": tuple(self.model.spec.out_strides)}

    def _export_impl(self, fmt: str = "jaxexport", path: str = "nas_export",
                     half: bool = False, optimize: bool = False):
        """Export the jitted predict step — 'params' / 'jaxexport' /
        'stablehlo' (TPU serving), plus the torch-interop formats for the
        v8 Detect family: 'pt' (reference-format checkpoint, inverse of
        the torch import) and 'torchscript' (traced reference module,
        the reference Exporter's first-listed format)."""
        from pathlib import Path

        if fmt == "params":
            from mo_yolo_tpu.utils.checkpoint import save_params
            save_params(path, self.variables)
            return path
        head_idx = len(self.model.spec.nodes)
        if fmt == "pt":
            from mo_yolo_tpu.utils.torch_export import export_reference_pt
            return export_reference_pt(
                self.variables, path,
                train_args={"model": self._cfg, "task": "detect",
                            "imgsz": self.imgsz, "names": self.names},
                head_idx=head_idx, task="detect", half=half)
        if fmt == "torchscript":
            from mo_yolo_tpu.utils.torch_export import export_torchscript
            return export_torchscript(
                self.variables, path, self._cfg, head_idx=head_idx,
                imgsz=self.imgsz, task="detect", names=self.names,
                half=half, optimize=optimize)
        frames = jnp.zeros((1, self.imgsz, self.imgsz, 3))
        variables = self.variables

        def fn(f):
            return self.model.apply(variables, f,
                                    method=self.model.predict_step)

        if fmt == "jaxexport":
            from jax import export as jexport
            exp = jexport.export(jax.jit(fn))(frames)
            out = Path(path).with_suffix(".jaxexport")
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_bytes(exp.serialize())
            return str(out)
        if fmt == "stablehlo":
            txt = jax.jit(fn).lower(frames).as_text()
            out = Path(path).with_suffix(".stablehlo.txt")
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(txt)
            return str(out)
        raise ValueError(
            f"unsupported NAS export format {fmt!r} (supported: 'params',"
            " 'jaxexport', 'stablehlo', 'pt', 'torchscript')")
