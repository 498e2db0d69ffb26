"""Batched multi-stream inference — independent videos sharded over chips.

The north-star scale-out (BASELINE.json): B video streams run in lockstep
through ONE jitted step whose batch axis is sharded over the mesh's `data`
axis — each chip owns its streams end-to-end (zero cross-chip traffic in
the frame loop; the reference has no equivalent, its DDP is train-only).

Streams can be different lengths: finished streams keep feeding their last
frame (masked on output) until the batch drains.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from mo_yolo_tpu.data.letterbox import preprocess
from mo_yolo_tpu.data.loaders import make_source


class MultiStreamPredictor:
    def __init__(self, model, variables, mesh=None, imgsz: int = 640,
                 conf: float = 0.5):
        from mo_yolo_tpu.parallel.mesh import make_mesh, make_sharded_stream_step

        from mo_yolo_tpu.data.letterbox import to_hw

        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.in_h, self.in_w = to_hw(imgsz)
        self.conf = conf
        self.mesh = mesh or make_mesh()
        self._step = make_sharded_stream_step(model, variables, self.mesh)

    def stream(self, sources: Sequence) -> Iterator[List[Optional[Dict]]]:
        """sources: list of B frame sources (B divisible by mesh size).
        Yields, per time step, a list of B per-stream result dicts
        (box/score/cls/obj_id/valid as numpy, model-input coords) — None for
        streams that have already ended."""
        import jax.numpy as jnp
        from mo_yolo_tpu.models.tracker import init_track_state

        B = len(sources)
        n_dev = int(np.prod(self.mesh.devices.shape))
        if B % n_dev:
            raise ValueError(f"need streams divisible by mesh size "
                             f"({B} vs {n_dev})")
        iters = [iter(make_source(s)) for s in sources]
        state = init_track_state(B, self.model.tracker.n_slots, self.model.hd)
        last = [None] * B
        alive = [True] * B
        while any(alive):
            batch = np.zeros((B, self.in_h, self.in_w, 3), np.float32)
            for b in range(B):
                if alive[b]:
                    try:
                        _, img = next(iters[b])
                        x, _ = preprocess(img, (self.in_h, self.in_w),
                                          scale_fill=True)
                        last[b] = x[0]
                    except StopIteration:
                        alive[b] = False
                if last[b] is not None:
                    batch[b] = last[b]
            if not any(alive):
                break
            state, out = self._step(self.variables, state, jnp.asarray(batch))
            from mo_yolo_tpu.models.tracker import unpack_outputs
            out_np = unpack_outputs(np.asarray(out))  # one fetch for all B
            yield [
                {k: out_np[k][b] for k in out_np} if alive[b] else None
                for b in range(B)
            ]
