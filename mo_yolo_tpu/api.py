"""Public API — the reference-shaped facade.

`MOTRTrack(model)` mirrors the reference entry class
(`ultralytics/models/MOTRtrack/model.py:22-246`): construct from a model
yaml or a saved checkpoint, then `.train() / .predict() / .val() /
.export() / .save()`. `YOLO` is the generic facade (`engine/model.py:20-30`)
routing by task.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import numpy as np

_PKG = Path(__file__).resolve().parent
_MODEL_DIR = _PKG / "cfg" / "models"


def _resolve_model_cfg(name: str) -> str:
    p = Path(name)
    if p.is_file():
        return str(p)
    cand = _MODEL_DIR / p.name
    if cand.is_file():
        return str(cand)
    raise FileNotFoundError(f"model config {name!r} not found "
                            f"(searched {_MODEL_DIR})")


class MOTRTrack:
    """End-to-end multi-object tracker (DecoderTracker) on TPU."""

    def __init__(self, model: str = "yolo_track.yaml", nc: Optional[int] = None,
                 imgsz: int = 640, dtype: str = "bfloat16",
                 impl: Optional[str] = None,  # None = pallas on TPU, xla on CPU
                 names: Optional[Dict[int, str]] = None,
                 seed: int = 0):
        import jax
        import jax.numpy as jnp
        from mo_yolo_tpu.models.tracking_model import (
            build_tracking_model, init_variables)

        self.imgsz = imgsz
        self.names = names or {}
        jdt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype]
        if str(model).endswith((".yaml", ".yml")):
            cfg = _resolve_model_cfg(str(model))
            self.model = build_tracking_model(cfg, nc=nc, impl=impl, dtype=jdt)
            self.variables = init_variables(
                self.model, jax.random.PRNGKey(seed), image_size=(imgsz, imgsz))
            self.cfg_path = cfg
        else:  # orbax checkpoint directory
            self.cfg_path = None
            self.load(str(model))

    # ------------------------------------------------------------------ #
    def predict(self, source, conf: float = 0.5, stream: bool = True,
                save_mot: Optional[str] = None):
        """Streaming tracking inference over a frame source. Returns a
        generator of TrackResults (stream=True) or a list."""
        from mo_yolo_tpu.engine.predictor import TrackPredictor

        pred = TrackPredictor(self.model, self.variables, imgsz=self.imgsz,
                              conf=conf, names=self.names)
        gen = pred.stream(source, save_mot=save_mot)
        return gen if stream else list(gen)

    __call__ = predict

    def val(self, data: Union[str, List[str]], conf: float = 0.5,
            max_gt: int = 64) -> Dict[str, float]:
        """Evaluate HOTA/MOTA/IDF1/mAP on a dataset yaml or image list."""
        from mo_yolo_tpu.engine.validator import TrackValidator

        if isinstance(data, str):
            from mo_yolo_tpu.data.dataset import load_dataset_yaml
            d = load_dataset_yaml(data)
            files = d["val"]
            self.names = self.names or d["names"]
        else:
            files = list(data)
        v = TrackValidator(self.model, self.variables, imgsz=self.imgsz,
                           conf=conf)
        return v(files, max_gt=max_gt)

    def train(self, data: str, epochs: int = 1, batch: int = 1,
              clip_len: int = 5, lr: float = 1e-4, max_gt: int = 64,
              save_dir: str = "runs/track", seed: int = 0,
              val_every: int = 0, log_every: int = 10) -> Dict[str, float]:
        """Train on a dataset yaml (see mo_yolo_tpu/train/trainer.py)."""
        from mo_yolo_tpu.train.trainer import TrackTrainer

        trainer = TrackTrainer(self, data=data, epochs=epochs, batch=batch,
                               clip_len=clip_len, lr=lr, max_gt=max_gt,
                               save_dir=save_dir, seed=seed,
                               val_every=val_every, log_every=log_every)
        return trainer.run()

    # ------------------------------------------------------------------ #
    def save(self, path: str):
        from mo_yolo_tpu.utils.checkpoint import save_params
        meta = {"cfg_path": self.cfg_path, "imgsz": self.imgsz,
                "names": self.names}
        save_params(path, self.variables)
        import json
        with open(str(Path(path).resolve()) + ".meta.json", "w") as f:
            json.dump(meta, f, default=str)

    def load(self, path: str):
        import json
        import jax
        from mo_yolo_tpu.models.tracking_model import (
            build_tracking_model, init_variables)
        from mo_yolo_tpu.utils.checkpoint import load_params

        with open(str(Path(path).resolve()) + ".meta.json") as f:
            meta = json.load(f)
        self.cfg_path = meta["cfg_path"]
        self.imgsz = meta.get("imgsz", 640)
        self.names = {int(k): v for k, v in (meta.get("names") or {}).items()}
        self.model = build_tracking_model(self.cfg_path)
        target = init_variables(self.model, jax.random.PRNGKey(0),
                                image_size=(self.imgsz, self.imgsz))
        self.variables = load_params(path, target)
        return self

    def load_torch(self, pt_path: str, strict: bool = False):
        """Import reference `.pt` weights (name-mapped)."""
        from mo_yolo_tpu.utils.checkpoint import import_torch_weights
        self.variables = import_torch_weights(pt_path, self.variables,
                                              strict=strict)
        return self

    def export(self, fmt: str = "stablehlo", path: str = "model_export"):
        """Export the jitted stream step (stablehlo text or orbax params —
        the TPU-relevant subset of the reference's 12 formats,
        `engine/exporter.py:76-93`)."""
        import jax
        import jax.numpy as jnp
        from mo_yolo_tpu.models.tracker import init_track_state

        if fmt == "params":
            self.save(path)
            return path
        if fmt == "stablehlo":
            state = init_track_state(1, self.model.tracker.n_slots,
                                     self.model.hd)
            frames = jnp.zeros((1, self.imgsz, self.imgsz, 3))
            lowered = jax.jit(
                lambda v, s, f: self.model.apply(v, s, f,
                                                 method=self.model.stream_step)
            ).lower(self.variables, state, frames)
            txt = lowered.as_text()
            out = Path(path).with_suffix(".stablehlo.txt")
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(txt)
            return str(out)
        raise ValueError(f"unsupported export format {fmt!r} "
                         "(supported: 'stablehlo', 'params')")


class YOLO:
    """Generic facade routing by task (reference `engine/model.py`)."""

    def __new__(cls, model: str = "yolo_track.yaml", task: str = "track",
                **kw):
        if task == "track":
            return MOTRTrack(model, **kw)
        raise NotImplementedError(
            f"task {task!r} not yet implemented in mo_yolo_tpu "
            "(available: 'track')")
