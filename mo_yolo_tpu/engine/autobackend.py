"""AutoBackend — uniform inference wrapper over saved model formats.

Equivalent of the reference `AutoBackend` (`nn/autobackend.py:321`), scoped
to the TPU-relevant formats: a live (model, variables) pair, an orbax
params checkpoint directory, a model yaml (fresh weights), or a serialized
`.jaxexport` AOT artifact. Exposes one `stream_step(state, frames)`
callable regardless of origin.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


class AutoBackend:
    def __init__(self, weights, imgsz: int = 640, dtype: str = "bfloat16",
                 nc: Optional[int] = None, **model_kw):
        import jax

        self._exported = None
        if isinstance(weights, tuple) and len(weights) == 2:
            self.model, self.variables = weights
        elif str(weights).endswith(".jaxexport"):
            # serialized AOT artifact (api.export(fmt='jaxexport')): the
            # weights are baked in; calling convention is
            # (variables, state_tuple, frames) with variables captured at
            # export — here replayed from the artifact itself
            from jax import export as jexport
            self._exported = jexport.deserialize(
                Path(str(weights)).read_bytes())
            self.model = None
            self.variables = None
            meta = Path(str(weights) + ".meta.json")
            self._n_slots, self._hd = 300, 256
            if meta.exists():
                import json
                d = json.loads(meta.read_text())
                self._n_slots = d.get("n_slots", 300)
                self._hd = d.get("hd", 256)
        elif str(weights).endswith((".yaml", ".yml")) or \
                Path(str(weights)).is_dir():
            from mo_yolo_tpu.api import MOTRTrack
            api = MOTRTrack(str(weights), imgsz=imgsz, dtype=dtype, nc=nc,
                            **model_kw)
            self.model, self.variables = api.model, api.variables
        elif str(weights).endswith(".pt"):
            # reference `.pt` checkpoint: build the architecture from the
            # model yaml named alongside (model.pt + model.yaml, or pass
            # yaml= via nc-style kwargs upstream), then name-map the torch
            # state_dict in (the reference AutoBackend unpickles the torch
            # module; a TPU runtime reconstructs instead — same weights,
            # our graph)
            from mo_yolo_tpu.api import MOTRTrack
            yml = Path(str(weights)).with_suffix(".yaml")
            cfg = str(yml) if yml.is_file() else "yolo_track.yaml"
            api = MOTRTrack(cfg, imgsz=imgsz, dtype=dtype, nc=nc,
                            **model_kw)
            api.load_torch(str(weights))
            self.model, self.variables = api.model, api.variables
        else:
            raise ValueError(f"unsupported weights source: {weights!r}")
        self.imgsz = imgsz
        if self._exported is None:
            self._step = jax.jit(lambda v, s, f: self.model.apply(
                v, s, f, method=self.model.stream_step))

    def new_state(self, batch: int = 1):
        from mo_yolo_tpu.models.tracker import init_track_state
        if self._exported is not None:
            return init_track_state(batch, self._n_slots, self._hd)
        return init_track_state(batch, self.model.tracker.n_slots,
                                self.model.hd)

    def stream_step(self, state, frames):
        """frames [B,H,W,3] float in [0,1] -> (new_state, outputs)."""
        if self._exported is not None:
            from mo_yolo_tpu.models.tracker import TrackState
            new_leaves, out = self._exported.call(tuple(state), frames)
            return TrackState(*new_leaves), out
        return self._step(self.variables, state, frames)

    __call__ = stream_step
