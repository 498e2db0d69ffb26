"""Direct inference of reference `.pt` checkpoints with torch on host CPU.

The reference `AutoBackend` pt branch unpickles the torch nn.Module and
runs it as-is (`nn/autobackend.py:321-420`, `nn/tasks.py:854-878`
`attempt_load_one_weight`). The TPU runtime's primary path is different —
`load_torch` name-maps the state_dict into the flax model and the TPU runs
our graph — but running the original torch module directly is the ground
truth for A/B-validating an import, so it ships as a host-side backend.

Requires the checkpoint's defining package (the reference `ultralytics`
fork or upstream ultralytics) to be importable at unpickle time, exactly
like the reference itself does.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


class TorchPtBackend:
    """Run a pickled reference checkpoint (`last.pt`/`best.pt` dicts of
    {model, ema, ...} or a bare nn.Module) with torch, CPU eval mode.

    forward() mirrors the reference AutoBackend calling convention
    (float CHW in [0,1]); detect() additionally decodes the v8 Detect
    head output into (xyxy, score, cls) with NMS on host.
    """

    def __init__(self, pt_path: str, fuse: bool = False):
        import torch
        try:
            ckpt = torch.load(pt_path, map_location="cpu",
                              weights_only=False)
        except (ModuleNotFoundError, AttributeError) as e:
            raise ModuleNotFoundError(
                f"unpickling {pt_path!r} needs the package that defined "
                f"it (install/point PYTHONPATH at the reference "
                f"`ultralytics`): {e}") from e
        model = (ckpt.get("ema") or ckpt.get("model")) \
            if isinstance(ckpt, dict) else ckpt
        if model is None:
            raise ValueError(f"{pt_path!r} holds no model "
                             f"(keys: {sorted(ckpt)})")
        self.ckpt = ckpt if isinstance(ckpt, dict) else {}
        model = model.float().eval()
        for p in model.parameters():
            p.requires_grad_(False)
        if fuse and hasattr(model, "fuse"):
            try:                     # reference fuses Conv+BN when asked
                model = model.fuse()
            except Exception:
                pass
        self.model = model
        self.names = getattr(model, "names", None) or \
            (self.ckpt.get("train_args") or {}).get("names")

    # ------------------------------------------------------------------ #
    def _to_torch(self, im):
        import torch
        x = np.asarray(im, np.float32)
        if x.ndim == 3:
            x = x[None]
        if x.shape[-1] == 3 and x.shape[1] != 3:    # NHWC (ours) -> NCHW
            x = np.transpose(x, (0, 3, 1, 2))
        if x.max() > 1.5:                           # uint8-range input
            x = x / 255.0
        return torch.from_numpy(np.ascontiguousarray(x))

    def forward(self, im):
        """Raw model output as numpy (nested tuples/lists preserved)."""
        import torch

        def to_np(y):
            if isinstance(y, (list, tuple)):
                return type(y)(to_np(t) for t in y)
            return y.numpy() if isinstance(y, torch.Tensor) else y

        with torch.no_grad():
            return to_np(self.model(self._to_torch(im)))

    __call__ = forward

    def detect(self, im, conf: float = 0.25, iou: float = 0.7,
               max_det: int = 300):
        """Decode a v8 Detect-head output ([B, 4+nc, A]: xywh in input
        pixels then class scores, `head.py:27-87`) into per-image
        (xyxy, score, cls) numpy arrays after class-aware NMS."""
        y = self.forward(im)
        while isinstance(y, (list, tuple)):
            y = y[0]
        out = []
        for p in np.asarray(y):                     # [4+nc, A]
            xywh, scores = p[:4].T, p[4:].T         # [A,4], [A,nc]
            cls = scores.argmax(1)
            sc = scores.max(1)
            keep = sc >= conf
            xywh, sc, cls = xywh[keep], sc[keep], cls[keep]
            xyxy = np.stack([xywh[:, 0] - xywh[:, 2] / 2,
                             xywh[:, 1] - xywh[:, 3] / 2,
                             xywh[:, 0] + xywh[:, 2] / 2,
                             xywh[:, 1] + xywh[:, 3] / 2], 1)
            k = _nms_classwise(xyxy, sc, cls, iou)[:max_det]
            out.append((xyxy[k], sc[k], cls[k]))
        return out


def _nms_classwise(xyxy, scores, cls, iou_thres: float) -> np.ndarray:
    """Greedy per-class NMS on host (the reference runs
    torchvision.ops.nms with a class offset, `utils/ops.py`)."""
    if len(xyxy) == 0:
        return np.zeros(0, np.int64)
    off = cls.astype(np.float32)[:, None] * 1e4     # class separation
    b = xyxy + off
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        x1 = np.maximum(b[i, 0], b[rest, 0])
        y1 = np.maximum(b[i, 1], b[rest, 1])
        x2 = np.minimum(b[i, 2], b[rest, 2])
        y2 = np.minimum(b[i, 3], b[rest, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = lambda q: (q[:, 2] - q[:, 0]) * (q[:, 3] - q[:, 1])
        ious = inter / (a(b[i:i + 1]) + a(b[rest]) - inter + 1e-9)
        order = rest[ious <= iou_thres]
    return np.asarray(keep, np.int64)


def load_pt_backend(pt_path: str, **kw) -> Optional[TorchPtBackend]:
    """None (with a log line) instead of raising when torch or the
    defining package is unavailable — callers treat pt-direct as an
    optional A/B facility."""
    try:
        return TorchPtBackend(pt_path, **kw)
    except Exception as e:
        from mo_yolo_tpu.utils.logging import LOGGER
        LOGGER.warning(f"pt-direct backend unavailable: {e}")
        return None
