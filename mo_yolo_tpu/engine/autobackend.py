"""AutoBackend — uniform inference wrapper over saved model formats.

Equivalent of the reference `AutoBackend` (`nn/autobackend.py:321`), scoped
to the TPU-relevant formats: a live (model, variables) pair, an orbax
params checkpoint directory, a model yaml (fresh weights), a serialized
`.jaxexport` AOT artifact, a jax2tf TF SavedModel directory, or a
`.tflite` flatbuffer (CPU serving interop). Exposes one
`stream_step(state, frames)` callable regardless of origin.

Reference `.pt` checkpoints enter through weight name-mapping
(`load_torch`) so the TPU always runs our graph; `torch_direct=True`
additionally unpickles the original torch module on host CPU
(`engine/torch_backend.py`, the reference AutoBackend pt branch) for
A/B-validating the import.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


class AutoBackend:
    def __init__(self, weights, imgsz: int = 640, dtype: str = "bfloat16",
                 nc: Optional[int] = None, torch_direct: bool = False,
                 **model_kw):
        import jax

        self.pt_direct = None
        self._exported = None
        self._tf_mod = None
        self._tflite = None
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
        elif str(weights).endswith(".tflite"):
            # TFLite flatbuffer from api.export(fmt='tflite'): positional
            # IO recovered from the converter's arg naming (args_tf_0[_k]
            # = state leaves, args_tf_1 = frame; Identity[_k] = new state
            # leaves then the packed outputs)
            self._init_tflite(str(weights))
            self.model = self.variables = None
        elif Path(str(weights), "saved_model.pb").is_file():
            # jax2tf SavedModel dir from api.export(fmt='saved_model')
            import tensorflow as tf
            self._tf_mod = tf.saved_model.load(str(weights))
            self._infer_dims([tuple(s.shape)
                              for s in self._tf_mod.f.input_signature[0]])
            self.model = self.variables = None
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
            if torch_direct:
                # also hold the original torch module for host-side A/B
                # (reference AutoBackend pt branch; see
                # engine/torch_backend.py)
                from mo_yolo_tpu.engine.torch_backend import load_pt_backend
                self.pt_direct = load_pt_backend(str(weights))
        else:
            raise ValueError(f"unsupported weights source: {weights!r}")
        self.imgsz = imgsz
        if self.model is not None:
            from mo_yolo_tpu.utils.jit_cache import jitted_method
            self._step = jitted_method(self.model, "stream_step")

    # ------------------------------------------------------------------ #
    def _infer_dims(self, state_shapes):
        """n_slots/hd from the exported state leaf shapes: every leaf is
        [B, n_slots, ...]; hd is the widest trailing dim."""
        self._n_slots = int(state_shapes[0][1])
        self._hd = max(int(s[2]) for s in state_shapes if len(s) == 3)

    def _init_tflite(self, path: str):
        import tensorflow as tf
        it = tf.lite.Interpreter(model_path=path)
        it.allocate_tensors()

        def in_key(d):
            # args_tf_0 -> (0,0); args_tf_0_3 -> (0,3); args_tf_1 -> (1,0)
            tail = d["name"].split("args_tf_")[-1].split(":")[0]
            parts = tail.split("_")
            return (int(parts[0]), int(parts[1]) if len(parts) > 1 else 0)

        def out_key(d):
            tail = d["name"].split(":")[0]
            return 0 if tail == "Identity" else int(tail.split("_")[-1])

        self._tfl_in = sorted(it.get_input_details(), key=in_key)
        self._tfl_out = sorted(it.get_output_details(), key=out_key)
        self._tflite = it
        self._infer_dims([tuple(d["shape"]) for d in self._tfl_in[:-1]])

    # ------------------------------------------------------------------ #
    def new_state(self, batch: int = 1):
        from mo_yolo_tpu.models.tracker import init_track_state
        if self.model is None:
            return init_track_state(batch, self._n_slots, self._hd)
        return init_track_state(batch, self.model.tracker.n_slots,
                                self.model.hd)

    def stream_step(self, state, frames):
        """frames [B,H,W,3] float in [0,1] -> (new_state, outputs)."""
        from mo_yolo_tpu.models.tracker import TrackState
        import numpy as np
        if self._exported is not None:
            new_leaves, out = self._exported.call(tuple(state), frames)
            return TrackState(*new_leaves), out
        if self._tf_mod is not None:
            import tensorflow as tf
            leaves = tuple(tf.constant(np.asarray(x)) for x in state)
            new_leaves, out = self._tf_mod.f(leaves, tf.constant(
                np.asarray(frames, np.float32)))
            return (TrackState(*(x.numpy() for x in new_leaves)),
                    out.numpy())
        if self._tflite is not None:
            it = self._tflite
            vals = list(state) + [frames]
            for d, x in zip(self._tfl_in, vals):
                it.set_tensor(d["index"],
                              np.asarray(x, d["dtype"]))
            it.invoke()
            outs = [it.get_tensor(d["index"]) for d in self._tfl_out]
            return TrackState(*outs[:-1]), outs[-1]
        return self._step(self.variables, state, frames)

    __call__ = stream_step
