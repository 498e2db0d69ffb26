"""FastSAM — segment-anything via a YOLOv8-seg model + prompt postprocess.

Equivalent of the reference FastSAM family (`ultralytics/models/fastsam/`,
886 LoC: a YOLOv8-seg checkpoint run in "everything" mode with
`FastSAMPrompt` selecting masks by box / point / everything / text
prompts). Here the model is our BackboneNeck + SegmentHead(nc=1) and the
prompt logic is host-side numpy over the device-produced masks.

Text prompts follow the reference's CLIP `retrieve` recipe
(`fastsam/prompt.py:306-340,395-403`: bbox crops on white background ->
image/text embedding cosine -> softmax over crops -> argmax) behind a
pluggable `TextImageEmbedder` protocol: real CLIP weights slot in when
available (`clip_embedder()` via transformers), and anything embedding
images+texts into one space (including a test mock) works identically.
"""

from __future__ import annotations

from typing import Any, List, Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mo_yolo_tpu.models.graph import BackboneNeck, GraphSpec, parse_model_yaml
from mo_yolo_tpu.models.heads_extra import SegmentHead


class TextImageEmbedder(Protocol):
    """Joint image/text embedding space (CLIP-shaped contract)."""

    def embed_images(self, images: List[np.ndarray]) -> np.ndarray:
        """uint8 HWC RGB crops -> [N, D] float."""
        ...

    def embed_texts(self, texts: List[str]) -> np.ndarray:
        """strings -> [M, D] float."""
        ...


def clip_embedder(model_name: str = "openai/clip-vit-base-patch32"):
    """Real CLIP behind the TextImageEmbedder protocol (requires the
    weights to exist locally — this environment has no network egress, so
    construction raises with a clear message when they don't)."""
    try:
        from transformers import CLIPModel, CLIPProcessor
        model = CLIPModel.from_pretrained(model_name)
        proc = CLIPProcessor.from_pretrained(model_name)
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            f"CLIP weights for {model_name!r} are not available locally; "
            "pass any TextImageEmbedder implementation instead") from e

    class _Clip:
        def embed_images(self, images):
            import torch
            with torch.no_grad():
                inp = proc(images=list(images), return_tensors="pt")
                return model.get_image_features(**inp).numpy()

        def embed_texts(self, texts):
            import torch
            with torch.no_grad():
                inp = proc(text=list(texts), return_tensors="pt",
                           padding=True)
                return model.get_text_features(**inp).numpy()

    return _Clip()


def retrieve_scores(crops: List[np.ndarray], text: str,
                    embedder: TextImageEmbedder) -> np.ndarray:
    """Reference `FastSAMPrompt.retrieve` (`prompt.py:306-318`): normalized
    image/text features, 100x cosine similarity, softmax over the crops."""
    img = np.asarray(embedder.embed_images(crops), np.float32)
    txt = np.asarray(embedder.embed_texts([text]), np.float32)
    img = img / np.maximum(np.linalg.norm(img, axis=-1, keepdims=True), 1e-9)
    txt = txt / np.maximum(np.linalg.norm(txt, axis=-1, keepdims=True), 1e-9)
    logits = 100.0 * img @ txt.T                      # [N, 1]
    e = np.exp(logits[:, 0] - logits[:, 0].max())
    return e / e.sum()


class FastSAMModel(nn.Module):
    """Backbone + single-class segmentation head ("everything" mode)."""

    spec: GraphSpec
    nm: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.head = SegmentHead(nc=1, nm=self.nm, dtype=self.dtype)

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train=train)
        return self.head(feats, train=train)

    def predict_step(self, images):
        """-> (boxes xyxy px [B,S,4], scores [B,S], coef [B,S,nm],
        protos [B,Hp,Wp,nm])."""
        boxes, cls, coef, protos = self(images, train=False)
        return boxes, cls[..., 0], coef, protos


class FastSAM:
    """Reference-shaped facade: `FastSAM(cfg)(image, bboxes=/points=)`."""

    def __init__(self, model: str = "yolo_track.yaml", imgsz: int = 640,
                 dtype=jnp.float32, seed: int = 0,
                 conf: float = 0.4, iou: float = 0.9, max_det: int = 64):
        spec = parse_model_yaml(model if "/" in str(model) else
                                _resolve(model))
        self.model = FastSAMModel(spec=spec, dtype=dtype)
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.variables = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, imgsz, imgsz, 3)))
        self._step = jax.jit(lambda v, x: self.model.apply(
            v, x, method=self.model.predict_step))

    def everything(self, image: np.ndarray):
        """All detected masks above conf, NMS'd. Returns dict with
        boxes [n,4] xyxy (model coords), scores [n], masks [n,Hp,Wp] bool
        at proto resolution."""
        from mo_yolo_tpu.data.letterbox import preprocess
        from mo_yolo_tpu.metrics.detection import box_iou_np
        from mo_yolo_tpu.models.heads_extra import SegmentHead as SH

        x, meta = preprocess(image, self.imgsz, scale_fill=True)
        boxes, scores, coef, protos = self._step(self.variables,
                                                 jnp.asarray(x))
        b = np.asarray(boxes[0], np.float32)
        s = np.asarray(scores[0], np.float32)
        order = np.argsort(-s)
        order = order[s[order] >= self.conf][:4 * self.max_det]
        kept = []
        for i in order:                       # host greedy NMS (n is small)
            if len(kept) >= self.max_det:
                break
            if kept and box_iou_np(b[i][None], b[kept]).max() > self.iou:
                continue
            kept.append(i)
        kept = np.asarray(kept, int)
        if len(kept) == 0:
            Hp, Wp = protos.shape[1:3]
            return {"boxes": np.zeros((0, 4), np.float32),
                    "scores": np.zeros(0, np.float32),
                    "masks": np.zeros((0, Hp, Wp), bool), "meta": meta}
        masks = np.asarray(SH.masks(coef[:, kept], protos)[0]) > 0.5
        return {"boxes": b[kept], "scores": s[kept], "masks": masks,
                "meta": meta}

    def _bbox_crops(self, image: np.ndarray, out) -> List[np.ndarray]:
        """Reference `_segment_image`/`_crop_image` (`prompt.py:31-43,320`):
        each mask's bbox region of the ORIGINAL image pasted on a white
        canvas — the crops CLIP scores against the text."""
        gx, gy = out["meta"]["gain"]
        H, W = image.shape[:2]
        crops = []
        for box in out["boxes"]:
            x1, y1, x2, y2 = box / np.array([gx, gy, gx, gy])
            x1 = int(np.clip(x1, 0, W - 1))
            y1 = int(np.clip(y1, 0, H - 1))
            x2 = int(np.clip(np.ceil(x2), x1 + 1, W))
            y2 = int(np.clip(np.ceil(y2), y1 + 1, H))
            canvas = np.full_like(image, 255)
            canvas[y1:y2, x1:x2] = image[y1:y2, x1:x2]
            crops.append(canvas)
        return crops

    def __call__(self, image: np.ndarray, bboxes=None, points=None,
                 texts: Optional[str] = None,
                 embedder: Optional[TextImageEmbedder] = None):
        """Prompted segmentation (reference `FastSAMPrompt`): select from
        the everything-mode masks by box IoU, point membership, or text
        similarity (`prompt.py:395-403` — requires `embedder`; use
        `clip_embedder()` when CLIP weights are available)."""
        out = self.everything(image)
        if texts is not None:
            if embedder is None:
                embedder = clip_embedder()
            if len(out["boxes"]) == 0:
                return out
            scores = retrieve_scores(self._bbox_crops(image, out), texts,
                                     embedder)
            keep = np.zeros(len(out["boxes"]), bool)
            keep[int(np.argmax(scores))] = True
            out = {k: (v[keep] if isinstance(v, np.ndarray) and
                       len(v) == len(keep) else v)
                   for k, v in out.items()}
            out["text_scores"] = scores
            return out
        if bboxes is None and points is None:
            return out
        # user prompts arrive in ORIGINAL-image pixels; the everything
        # masks/boxes live in model-input coords (scale_fill letterbox) —
        # map prompts through the same transform first
        gx, gy = out["meta"]["gain"]
        keep = np.zeros(len(out["boxes"]), bool)
        if bboxes is not None:
            from mo_yolo_tpu.metrics.detection import box_iou_np
            bb = np.asarray(bboxes, float).reshape(-1, 4) * \
                np.array([gx, gy, gx, gy])
            if len(out["boxes"]):
                iou = box_iou_np(bb, out["boxes"])
                keep[np.argmax(iou, axis=1)] |= iou.max(1) > 0
        if points is not None and len(out["masks"]):
            Hp, Wp = out["masks"].shape[1:]
            pts = np.asarray(points, float).reshape(-1, 2) * \
                np.array([gx, gy])
            for (px, py) in pts:
                gx = int(px / self.imgsz * Wp)
                gy = int(py / self.imgsz * Hp)
                hits = out["masks"][:, min(gy, Hp - 1), min(gx, Wp - 1)]
                if hits.any():
                    # smallest containing mask (reference point behavior)
                    areas = out["masks"].sum(axis=(1, 2)).astype(float)
                    areas[~hits] = np.inf
                    keep[int(np.argmin(areas))] = True
        return {k: (v[keep] if isinstance(v, np.ndarray) and
                    len(v) == len(keep) else v)
                for k, v in out.items()}


def _resolve(name: str) -> str:
    from mo_yolo_tpu.api import _resolve_model_cfg
    return _resolve_model_cfg(name)
