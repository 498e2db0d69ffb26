"""AutoBackend — uniform inference wrapper over saved model formats.

Equivalent of the reference `AutoBackend` (`nn/autobackend.py:321`), scoped
to the TPU-relevant formats: a live (model, variables) pair, an orbax
params checkpoint directory, or a model yaml (fresh weights). Exposes one
`stream_step(state, frames)` callable regardless of origin.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


class AutoBackend:
    def __init__(self, weights, imgsz: int = 640, dtype: str = "bfloat16",
                 nc: Optional[int] = None):
        import jax

        if isinstance(weights, tuple) and len(weights) == 2:
            self.model, self.variables = weights
        elif str(weights).endswith((".yaml", ".yml")) or \
                Path(str(weights)).is_dir():
            from mo_yolo_tpu.api import MOTRTrack
            api = MOTRTrack(str(weights), imgsz=imgsz, dtype=dtype, nc=nc)
            self.model, self.variables = api.model, api.variables
        else:
            raise ValueError(f"unsupported weights source: {weights!r}")
        self.imgsz = imgsz
        self._step = jax.jit(lambda v, s, f: self.model.apply(
            v, s, f, method=self.model.stream_step))

    def new_state(self, batch: int = 1):
        from mo_yolo_tpu.models.tracker import init_track_state
        return init_track_state(batch, self.model.tracker.n_slots,
                                self.model.hd)

    def stream_step(self, state, frames):
        """frames [B,H,W,3] float in [0,1] -> (new_state, outputs)."""
        return self._step(self.variables, state, frames)

    __call__ = stream_step
