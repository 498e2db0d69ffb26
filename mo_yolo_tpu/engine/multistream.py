"""Batched multi-stream inference — independent videos sharded over chips.

The north-star scale-out (BASELINE.json): B video streams run in lockstep
through ONE jitted step whose batch axis is sharded over the mesh's `data`
axis — each chip owns its streams end-to-end (zero cross-chip traffic in
the frame loop; the reference has no equivalent, its DDP is train-only).

Streams can be different lengths: finished streams keep feeding their last
frame (masked on output) until the batch drains.

Streaming contract (round-4 VERDICT weak #3): same as the single-stream
predictor's device path — RAW uint8 frames cross PCIe (4x fewer bytes than
float32), `ops.preprocess.device_letterbox` resizes on-chip staying uint8,
and the backbone stem consumes u8 directly with /255 folded into its
kernel (`models/layers.py:_TapStem`), so no full-resolution float tensor
ever touches HBM. When the streams disagree on source geometry the frames
are letterboxed on host in INTEGER u8 (cv2 semantics) and still ship as
uint8; `device_preprocess=False` (default on the CPU backend) keeps the
legacy float32 host path.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from mo_yolo_tpu.data.letterbox import letterbox, preprocess
from mo_yolo_tpu.data.loaders import make_source


class MultiStreamPredictor:
    def __init__(self, model, variables, mesh=None, imgsz: int = 640,
                 conf: float = 0.5,
                 device_preprocess: Optional[bool] = None):
        import jax

        from mo_yolo_tpu.parallel.mesh import make_mesh, make_sharded_stream_step

        from mo_yolo_tpu.data.letterbox import to_hw

        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.in_h, self.in_w = to_hw(imgsz)
        self.conf = conf
        self.mesh = mesh or make_mesh()
        self._step = make_sharded_stream_step(model, variables, self.mesh)
        if device_preprocess is None:
            device_preprocess = jax.default_backend() != "cpu"
        self.device_preprocess = bool(device_preprocess)
        self._raw_steps: Dict = {}  # (h, w) -> jitted sharded u8 step

    def _raw_step(self, raw_hw):
        """Sharded step consuming RAW uint8 [B, h, w, 3]: on-device
        letterbox (uint8 in, uint8 out — identity when already at input
        res) feeding the u8-native stem. One compile per source geometry,
        cached (same policy as the single-stream predictor)."""
        if raw_hw not in self._raw_steps:
            import jax
            import jax.numpy as jnp

            from mo_yolo_tpu.ops.preprocess import device_letterbox
            from mo_yolo_tpu.parallel.mesh import replicate, shard_batch

            hw = (self.in_h, self.in_w)
            model = self.model

            def _fn(v, s, u8):
                x = device_letterbox(u8, hw, scale_fill=True,
                                     dtype=jnp.uint8)
                return model.apply(v, s, x, method=model.stream_step)

            rep = replicate(self.mesh)
            b_sh = shard_batch(self.mesh, batch_axis_index=0)
            self._raw_steps[raw_hw] = jax.jit(
                _fn, in_shardings=(rep, b_sh, b_sh),
                out_shardings=(b_sh, b_sh))
        return self._raw_steps[raw_hw]

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

        # u8 contract: peek one frame per stream to pick the RAW batch
        # geometry. All-equal source shapes ship raw (device resizes);
        # mixed shapes host-letterbox in integer u8 to the input res
        # (device letterbox is then the identity). Either way uint8
        # crosses PCIe.
        raw_hw = None
        heads: List = [None] * B
        if self.device_preprocess:
            shapes = set()
            for b in range(B):
                try:
                    heads[b] = next(iters[b])
                    shapes.add(heads[b][1].shape[:2])
                except StopIteration:
                    pass
            live_shapes = {s for s in shapes}
            raw_hw = (live_shapes.pop() if len(live_shapes) == 1
                      else (self.in_h, self.in_w))
            step = self._raw_step(raw_hw)
        else:
            step = self._step

        def _next(b):
            if heads[b] is not None:
                item, heads[b] = heads[b], None
                return item
            return next(iters[b])

        def _to_raw(img):
            if img.shape[:2] == raw_hw:
                return img
            out, _, _ = letterbox(img, raw_hw, scale_fill=True)
            return out

        last = [None] * B
        alive = [True] * B
        while any(alive):
            if raw_hw is not None:
                batch = np.zeros((B, raw_hw[0], raw_hw[1], 3), np.uint8)
            else:
                batch = np.zeros((B, self.in_h, self.in_w, 3), np.float32)
            for b in range(B):
                if alive[b]:
                    try:
                        _, img = _next(b)
                        if raw_hw is not None:
                            last[b] = _to_raw(img)
                        else:
                            x, _ = preprocess(img, (self.in_h, self.in_w),
                                              scale_fill=True)
                            last[b] = x[0]
                    except StopIteration:
                        alive[b] = False
                if last[b] is not None:
                    batch[b] = last[b]
            if not any(alive):
                break
            state, out = step(self.variables, state, jnp.asarray(batch))
            from mo_yolo_tpu.models.tracker import unpack_outputs
            out_np = unpack_outputs(np.asarray(out))  # one fetch for all B
            yield [
                {k: out_np[k][b] for k in out_np} if alive[b] else None
                for b in range(B)
            ]
