"""Training session telemetry (reference `hub/session.py` HUBTrainingSession:
heartbeats + metric uploads to the web service). Here: a callbacks-bus
subscriber that journals metrics/heartbeats into the registry and pushes
the final weights — pod-worker-safe (process 0 only writes)."""

from __future__ import annotations

import json
import time
from typing import Optional

from mo_yolo_tpu.hub.registry import Registry


class TrainingSession:
    def __init__(self, registry: Optional[Registry] = None,
                 model_id: str = "run", heartbeat_s: float = 30.0):
        self.registry = registry or Registry()
        self.model_id = model_id
        self.heartbeat_s = heartbeat_s
        self.dir = self.registry.root / "runs" / model_id
        self._last_beat = 0.0
        self._is_writer = True
        try:
            import jax
            self._is_writer = jax.process_index() == 0
        except Exception:
            pass
        if self._is_writer:
            self.dir.mkdir(parents=True, exist_ok=True)

    # -- bus subscribers ---------------------------------------------- #
    def attach(self, bus):
        bus.add("on_train_batch_end", self.on_batch)
        bus.add("on_train_epoch_end", self.on_epoch)
        bus.add("on_train_end", self.on_end)

    def _append(self, name: str, rec: dict):
        if not self._is_writer:
            return
        with open(self.dir / name, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")

    def on_batch(self, step: int = 0, metrics=None, **kw):
        now = time.time()
        if now - self._last_beat >= self.heartbeat_s:
            self._last_beat = now
            self._append("heartbeat.jsonl", {"ts": now, "step": step})

    def on_epoch(self, epoch: int = 0, metrics=None, **kw):
        self._append("metrics.jsonl",
                     {"ts": time.time(), "epoch": epoch,
                      "metrics": metrics or {}})

    def on_end(self, metrics=None, **kw):
        self._append("metrics.jsonl",
                     {"ts": time.time(), "final": True,
                      "metrics": metrics or {}})

    def upload_final(self, api_model):
        """Push the trained weights into the registry (reference uploads
        best.pt at train end). The rebuild metadata (`.meta.json`, written
        by `api.save` as a sibling of the orbax dir) is pushed under the
        sibling name so `MOTRTrack(registry.pull(...))` reloads directly."""
        if not self._is_writer:
            return None
        out = str(self.dir / "weights")
        api_model.save(out)
        dst = self.registry.push(f"{self.model_id}.weights", out)
        import os
        if os.path.isfile(out + ".meta.json"):
            self.registry.push(f"{self.model_id}.weights.meta.json",
                               out + ".meta.json")
        return dst
