"""Streaming tracking inference engine.

Equivalent of the reference `BasePredictor.stream_inference` +
`TrackPredictor` (`engine/predictor.py:257-328`,
`models/MOTRtrack/predict.py`): iterate a frame source, preprocess
(scaleFill letterbox), run the jitted per-frame step, postprocess the
fixed-shape device outputs into `TrackResults` (conf/ID filtering, box
rescale to original pixels), and optionally emit MOT-challenge txt.

TPU-first differences: the whole per-frame compute INCLUDING the tracker
update is one jitted device step (the reference syncs to host for ID logic
every frame); host work is decode, letterbox and the final small result
fetch. Per-stage timings are kept (the reference's `ops.Profile` speed
dict, `predictor.py:287-296`).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from mo_yolo_tpu.data.letterbox import boxes_to_original, preprocess
from mo_yolo_tpu.data.loaders import make_source
from mo_yolo_tpu.engine.results import TrackResults
from mo_yolo_tpu.metrics.mot import write_mot_txt


class TrackPredictor:
    def __init__(self, model, variables, imgsz: int = 640,
                 conf: float = 0.5, names=None, classes=None,
                 vid_stride: int = 1, visualize: bool = False,
                 workers: int = 2, callbacks=None,
                 device_preprocess: Optional[bool] = None):
        import jax

        from mo_yolo_tpu.data.letterbox import to_hw
        from mo_yolo_tpu.utils.callbacks import CallbackBus

        # predict-lifecycle event bus (reference BasePredictor fires
        # on_predict_{start,batch_start,batch_end,end},
        # engine/predictor.py:257-328); bare bus by default — predict
        # stays logger-free unless the caller attaches integrations
        self.callbacks = callbacks or CallbackBus()
        self.model = model
        self.variables = variables
        self.imgsz = imgsz               # int, (h, w), or "WxH" (rect)
        self.in_h, self.in_w = to_hw(imgsz)
        self.conf = conf
        self.names = names or {}
        self.vid_stride = max(int(vid_stride), 1)
        # reference `workers`: decode-thread count for the native loader
        self.workers = max(int(workers), 1)
        # reference `classes` filter: restrict predictions to these ids
        self.classes = None if classes is None else \
            np.asarray(sorted({int(c) for c in np.atleast_1d(classes)}))
        from mo_yolo_tpu.utils.jit_cache import jitted_method
        self._step = jitted_method(model, "stream_step")
        # on-device letterbox+normalize (round-4 north star): ship RAW
        # uint8 frames (4x fewer PCIe bytes) and fuse resize/pad/normalize
        # into the jitted step. Default ON off-CPU; host path kept for CPU
        # (XLA-CPU resize is slower than the threaded C++ loader) and as
        # an explicit opt-out.
        if device_preprocess is None:
            device_preprocess = jax.default_backend() != "cpu"
        # visualize's extra feature forward consumes the preprocessed
        # frame on the host path — keep the two modes exclusive
        self.device_preprocess = bool(device_preprocess) and not visualize
        if self.device_preprocess:
            import jax.numpy as jnp

            from mo_yolo_tpu.ops.preprocess import device_letterbox
            hw = (self.in_h, self.in_w)

            def _raw_step(v, s, u8):
                # letterbox stays uint8 (cv2 semantics) so the PCIe
                # payload is 4x smaller; the backbone stem normalizes
                # on device (layers._TapStem)
                x = device_letterbox(u8, hw, scale_fill=True,
                                     dtype=jnp.uint8)
                return model.apply(v, s, x, method=model.stream_step)

            self._step_raw = jax.jit(_raw_step)
        else:
            self._step_raw = None
        # reference `visualize`: dump per-stage feature-map grids under
        # save_dir (extra traced forward — debug mode only)
        self.visualize = visualize
        if visualize:
            _ff = jitted_method(model, "frame_forward")
            self._feat_step = lambda v, f: _ff(v, f)[1]
        else:
            self._feat_step = None
        self.speed = {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}

    def reset_state(self):
        """Explicit new-sequence reset (replaces the reference's broken
        `is_first` flag, SURVEY.md 'hard parts' #5)."""
        from mo_yolo_tpu.models.tracker import init_track_state
        return init_track_state(1, self.model.tracker.n_slots, self.model.hd)

    def _frames(self, source):
        """Yield (path, preprocessed [1,H,W,3] f32, meta, orig_img|None).

        Directory/list sources of jpg/png go through the native C++ loader
        (threaded decode+letterbox ahead of the device); anything else falls
        back to PIL preprocessing.
        """
        from mo_yolo_tpu.native import frameloader as nfl

        if self.device_preprocess:
            # RAW path: decode only (C++/PIL); resize+pad+normalize run on
            # the device inside the jitted step (ops/preprocess.py). uint8
            # crosses the bus; meta mirrors the host `preprocess` exactly.
            from mo_yolo_tpu.ops.preprocess import device_preprocess_meta
            for path, img in make_source(source, vid_stride=self.vid_stride):
                meta = device_preprocess_meta(img.shape[:2],
                                              (self.in_h, self.in_w))
                yield path, img[None], meta, img
            return

        if isinstance(source, (str, Path)) or (
                isinstance(source, (list, tuple)) and source and
                isinstance(source[0], (str, Path))):
            try:
                from mo_yolo_tpu.data.loaders import list_images
                files = list_images(source) if isinstance(source, (str, Path)) \
                    else [str(p) for p in source]
                if nfl.available() and all(
                        f.lower().endswith((".jpg", ".jpeg", ".png"))
                        for f in files):
                    ld = nfl.NativeFrameLoader(files, self.in_h, self.in_w,
                                               n_threads=self.workers,
                                               scale_fill=True)
                    for p, buf, (oh, ow) in ld:
                        meta = {"orig_shape": (oh, ow),
                                "gain": (self.in_w / ow, self.in_h / oh),
                                "pad": (0.0, 0.0),
                                "input_shape": (self.in_h, self.in_w),
                                "scale_fill": True}
                        yield p, buf[None], meta, None
                    return
            except FileNotFoundError:
                raise
            except Exception:
                pass  # fall through to PIL path
        for path, img in make_source(source, vid_stride=self.vid_stride):
            x, meta = preprocess(img, (self.in_h, self.in_w),
                                 scale_fill=True)
            yield path, x, meta, img

    def stream(self, source, save_mot: Optional[str] = None,
               save: bool = False, save_crop: bool = False,
               save_dir: str = "runs/track/predict",
               line_width: int = 2, show_labels: bool = True,
               show_conf: bool = True, boxes: bool = True,
               show: bool = False) -> Iterator[TrackResults]:
        """Yield TrackResults per frame; optionally write MOT txt,
        annotated frames (`save`, reference BasePredictor `save`) and
        per-box crops (`save_crop`) under `save_dir`.

        Generator semantics (same as the reference's `stream_inference`):
        predict lifecycle callbacks are driven by CONSUMPTION of the
        stream — on_predict_start fires on the first next(), per-batch
        events as frames are pulled, and on_predict_end in the generator's
        finally block (i.e. at exhaustion, explicit close, or GC)."""
        import jax.numpy as jnp

        self.callbacks.fire("on_predict_start", predictor=self)
        state = self.reset_state()
        mot_fh = None
        if save_mot:
            Path(save_mot).parent.mkdir(parents=True, exist_ok=True)
            mot_fh = open(save_mot, "w")
        n = 0
        vis_i = 0      # frames visualized (n lags one frame behind)
        t1 = time.perf_counter()
        pending = None  # (path, meta, img, device outputs) one step behind
        try:
            # software pipeline: dispatch frame t+1 before fetching frame t's
            # results, hiding per-dispatch latency behind device compute
            # (jax dispatch is async; the fetch is the only sync point)
            step = self._step_raw if self.device_preprocess else self._step
            for path, x, meta, img in self._frames(source):
                t0, t1 = t1, time.perf_counter()  # t1-t0 = decode+preprocess
                state, out = step(self.variables, state, jnp.asarray(x))
                if self._feat_step is not None:
                    from mo_yolo_tpu.utils.plotting import (
                        feature_visualization)
                    feats = self._feat_step(self.variables, jnp.asarray(x))
                    # per-frame subdir (reference saves per-image under
                    # save_dir/<stem>/) so later frames don't overwrite
                    feature_visualization(
                        [np.asarray(f, np.float32) for f in feats],
                        str(Path(save_dir) / f"{Path(path).stem}_{vis_i}"))
                    vis_i += 1
                if pending is not None:
                    yield self._emit(pending, mot_fh, n, save, save_crop,
                                     save_dir, line_width, show_labels,
                                     show_conf, boxes, show)
                    self.callbacks.fire("on_predict_batch_end",
                                        predictor=self, step=n)
                    n += 1
                pending = (path, meta, img, out)
                t2 = time.perf_counter()
                self.speed = {"preprocess": (t1 - t0) * 1e3,
                              "dispatch": (t2 - t1) * 1e3}
            if pending is not None:
                yield self._emit(pending, mot_fh, n, save, save_crop,
                                 save_dir, line_width, show_labels,
                                 show_conf, boxes, show)
                self.callbacks.fire("on_predict_batch_end",
                                    predictor=self, step=n)
        finally:
            if mot_fh is not None:
                mot_fh.close()
            self.callbacks.fire("on_predict_end", predictor=self)

    def _emit(self, pending, mot_fh, n, save=False, save_crop=False,
              save_dir="runs/track/predict", line_width=2, show_labels=True,
              show_conf=True, boxes=True, show=False) -> TrackResults:
        from mo_yolo_tpu.models.tracker import unpack_outputs
        path, meta, img, out = pending
        res_np = unpack_outputs(np.asarray(out[0]))  # ONE host fetch
        res = self._postprocess(res_np, meta, path, img)
        if mot_fh is not None and len(res):
            write_mot_txt(mot_fh, n, res.track_id, res.boxes_xyxy, res.conf)
        stem = Path(path).stem if path else f"frame{n:06d}"
        # '#'-suffixed video-frame paths collapse to one stem — keep n
        stem = f"{stem.replace('#', '_')}_{n:06d}" if "#" in str(path) else stem
        if save:
            res.save(Path(save_dir) / f"{stem}.jpg", line_width=line_width,
                     show_labels=show_labels, show_conf=show_conf,
                     boxes=boxes)
        if show:
            from mo_yolo_tpu.utils.plotting import show_image
            show_image(res.plot(line_width=line_width,
                                show_labels=show_labels,
                                show_conf=show_conf, boxes=boxes))
        if save_crop:
            res.save_crop(Path(save_dir) / "crops", file_name=stem)
        return res

    def _postprocess(self, out: dict, meta: dict, path: str,
                     img: np.ndarray) -> TrackResults:
        """Filter to live tracks above conf (reference `predict.py:42-77`:
        obj_idxes >= 0 & conf), scale boxes to original pixels."""
        keep = out["valid"] & (out["obj_id"] >= 0) & (out["score"] >= self.conf)
        if self.classes is not None:
            keep &= np.isin(out["cls"].astype(int), self.classes)
        boxes = out["box"][keep]  # cxcywh in [0,1] of model input
        ih, iw = meta["input_shape"]
        xyxy = np.stack([
            (boxes[:, 0] - boxes[:, 2] / 2) * iw,
            (boxes[:, 1] - boxes[:, 3] / 2) * ih,
            (boxes[:, 0] + boxes[:, 2] / 2) * iw,
            (boxes[:, 1] + boxes[:, 3] / 2) * ih], 1) if len(boxes) else \
            np.zeros((0, 4))
        xyxy = boxes_to_original(xyxy, meta)
        return TrackResults(
            boxes_xyxy=xyxy,
            conf=out["score"][keep],
            cls=out["cls"][keep].astype(int),
            track_id=out["obj_id"][keep].astype(int),
            orig_shape=meta["orig_shape"],
            path=path, names=self.names, orig_img=img)
