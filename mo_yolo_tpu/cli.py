"""`yolo`-style command line interface.

Mirrors the reference CLI entrypoint (`cfg/__init__.py:262-413`,
console script `setup.py:74`): `python -m mo_yolo_tpu <task> <mode> k=v...`
e.g.

    python -m mo_yolo_tpu track predict model=yolo_track.yaml source=imgs/
    python -m mo_yolo_tpu track train model=yolo_track.yaml data=MOT.yaml epochs=1
    python -m mo_yolo_tpu track val model=ckpt_dir data=MOT.yaml
    python -m mo_yolo_tpu track export model=ckpt_dir format=stablehlo
    python -m mo_yolo_tpu track bench imgsz=640
    python -m mo_yolo_tpu detect track model=ckpt_dir source=video.mp4 tracker=botsort
    python -m mo_yolo_tpu segment train model=yolov8n-seg data=d.yaml epochs=10
    python -m mo_yolo_tpu pose predict model=ckpt kpt_shape=[17,3] source=imgs/
    python -m mo_yolo_tpu classify val model=ckpt data=imagenette/
    python -m mo_yolo_tpu sam predict source=imgs/ texts="a dog"

Tasks: track detect rtdetr nas sam fastsam segment pose classify.
Modes: train val predict track export tune bench benchmark.
`tune` runs hyperparameter search (max_samples=N grace_period=G), e.g.
    python -m mo_yolo_tpu track tune data=MOT.yaml epochs=8 max_samples=4
Specials: checks version settings cfg copy-cfg.
Any default.yaml key is accepted as k=v (cfg=custom.yaml for a file).
"""

from __future__ import annotations

import sys
from typing import Any, Dict

from mo_yolo_tpu.utils.logging import LOGGER

TASKS = ("track", "detect", "rtdetr", "nas", "sam", "fastsam",
         "segment", "pose", "classify")
MODES = ("train", "val", "predict", "track", "export", "tune", "bench",
         "benchmark")


def parse_kv(args) -> Dict[str, Any]:
    out = {}
    for a in args:
        if "=" not in a:
            raise SystemExit(f"expected k=v argument, got {a!r}")
        k, v = a.split("=", 1)
        if v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        elif v[:1] in "[({":
            # list/tuple/dict values, e.g. kpt_shape=[17,3] (reference
            # smart_value -> ast.literal_eval, cfg/__init__.py)
            import ast
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def _special(cmd: str, rest) -> int:
    """Reference special commands (`cfg/__init__.py:282-296`): checks,
    version, settings [reset], cfg, copy-cfg."""
    from pathlib import Path

    cfg_path = Path(__file__).resolve().parent / "cfg" / "default.yaml"
    if cmd == "version":
        from mo_yolo_tpu import __version__
        print(__version__)
    elif cmd == "cfg":
        print(cfg_path.read_text())
    elif cmd == "copy-cfg":
        import shutil
        dst = Path.cwd() / "default_copy.yaml"
        shutil.copy(cfg_path, dst)
        LOGGER.info(f"{cfg_path} copied to {dst}\nUsage: python -m "
                    f"mo_yolo_tpu cfg={dst.name} <task> <mode> ...")
    elif cmd == "settings":
        from mo_yolo_tpu.utils.settings import load_settings, settings_path
        s = load_settings()
        if rest and rest[0] == "reset":
            s.reset()
            LOGGER.info("Settings reset successfully")
            s = load_settings()
        print(f"settings: {settings_path()}")
        for k, v in sorted(s.items()):
            print(f"{k}={v}")
    elif cmd == "checks":
        import importlib.util as iu
        import platform
        import jax
        from mo_yolo_tpu import __version__
        print(f"mo_yolo_tpu {__version__}  python {platform.python_version()}"
              f"  jax {jax.__version__}")
        print(f"backend: {jax.default_backend()}  devices: "
              f"{[str(d) for d in jax.devices()]}")
        for dep in ("flax", "optax", "orbax.checkpoint", "numpy", "PIL",
                    "scipy", "torch", "tensorflow"):
            print(f"  {dep}: "
                  f"{'ok' if iu.find_spec(dep.split('.')[0]) else 'MISSING'}")
    else:
        return 1
    return 0


SPECIAL = ("checks", "version", "settings", "cfg", "copy-cfg")


# keys that route into the trainers' `hyp` dict when not first-class
# parameters of the target trainer (the reference flattens its whole
# default.yaml; our trainers take augmentation/gain/optimizer knobs as hyp)
HYP_KEYS = {"hsv_h", "hsv_s", "hsv_v", "degrees", "translate", "scale",
            "shear", "perspective", "fliplr", "flipud", "mosaic", "mixup",
            "copy_paste", "box", "cls", "dfl", "pose", "kobj",
            "label_smoothing", "optimizer", "momentum", "cos_lr", "lrf",
            "warmup_momentum", "warmup_bias_lr", "warmup_epochs",
            "close_mosaic"}
ALIASES = {"lr0": "lr"}


def route_kwargs(kv: Dict[str, Any], *sigs, allow_hyp: bool = True
                 ) -> Dict[str, Any]:
    """Split flat config keys into (accepted kwargs, hyp dict, dropped).

    `sigs` are callables whose signatures define the accepted surface
    (facade method + trainer __init__). Unknown keys are warned about and
    dropped — a full default.yaml copy can drive any mode (reference
    `cfg=` workflow) without crashing on section keys the mode ignores."""
    import inspect
    kv = dict(kv)
    for a, b in ALIASES.items():
        if a in kv and b not in kv:
            kv[b] = kv.pop(a)
    if "project" in kv or "name" in kv:
        # reference save-dir composition incl. `exist_ok` (`cfg` ->
        # `get_save_dir` -> `increment_path`): never overwrite an earlier
        # run — runs/exp -> runs/exp2 -> ... unless exist_ok=true
        from mo_yolo_tpu.utils.files import increment_path
        base = f"{kv.pop('project', 'runs')}/{kv.pop('name', 'exp')}"
        kv.setdefault("save_dir", str(increment_path(
            base, exist_ok=bool(kv.get("exist_ok", False)))))
        kv.pop("project", None)
        kv.pop("name", None)
    kv.pop("exist_ok", None)
    accepted = set()
    for s in sigs:
        accepted |= set(inspect.signature(s).parameters)
    accepted -= {"self", "data", "source", "kw", "kwargs"}
    out, dropped = {}, []
    hyp = dict(kv.pop("hyp", {}) or {})
    for k, v in kv.items():
        if k in accepted:
            out[k] = v
        elif allow_hyp and k in HYP_KEYS:
            hyp[k] = v
        else:
            dropped.append(k)
    if hyp and allow_hyp:
        out["hyp"] = hyp
    if dropped:
        LOGGER.warning("ignoring config keys not applicable here: "
                       f"{sorted(dropped)}")
    return out


def _use_device(d: str) -> None:
    """reference `device` key: pick the JAX device computations default
    to — 'cpu', 'tpu', 'tpu:1', or a bare index into jax.devices()."""
    import jax
    d = d.lower()
    if ":" in d:
        plat, idx = d.split(":", 1)
        devs, idx = jax.devices(plat), int(idx)
    elif d.isdigit():
        devs, idx = jax.devices(), int(d)
    else:
        devs, idx = jax.devices(d), 0
    jax.config.update("jax_default_device", devs[idx])
    LOGGER.info(f"device={d}: defaulting to {devs[idx]}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help", "help"):
        print(__doc__)
        return 0
    c = argv[0].lstrip("-")
    if c in SPECIAL:
        return _special(c, argv[1:])
    task = argv[0] if argv and argv[0] in TASKS else "track"
    rest = argv[1:] if argv and argv[0] in TASKS else argv
    if not rest or rest[0] not in MODES:
        raise SystemExit(f"usage: mo_yolo_tpu [{'|'.join(TASKS)}] "
                         f"<{'|'.join(MODES)}> k=v ...")
    mode, kv = rest[0], parse_kv(rest[1:])

    # reference `cfg=custom.yaml` (copy-cfg workflow): file values are the
    # base, explicit k=v args override; `task`/`mode` keys in the file are
    # honored only when not given on the command line (already resolved).
    cfg_file = kv.pop("cfg", None)
    if cfg_file:
        import yaml
        with open(cfg_file) as f:
            base = yaml.safe_load(f) or {}
        base.pop("task", None)
        base.pop("mode", None)
        kv = {**{k: v for k, v in base.items() if v is not None}, **kv}

    model_arg = kv.pop("model", None)
    imgsz_given = "imgsz" in kv
    imgsz = kv.pop("imgsz", 640)

    # reference global keys honored before any model is built
    device = kv.pop("device", None)
    if device not in (None, "", "None"):
        _use_device(str(device))
    if kv.pop("dnn", False):
        LOGGER.warning("dnn=True (OpenCV-DNN ONNX backend) is N/A in the "
                       "TPU stack; ignored")
    # reference `amp`: mixed precision on by default -> bfloat16 network
    # (TPU's AMP); amp=False forces float32 unless dtype is explicit
    amp = kv.pop("amp", True)
    if not amp and "dtype" not in kv:
        kv["dtype"] = "float32"

    if mode == "bench":
        import subprocess
        cmd = [sys.executable, "bench.py"]
        if imgsz_given:     # else bench's default dual-shape headline mode
            if isinstance(imgsz, (list, tuple)):   # [h, w] -> "WxH"
                cmd += ["--imgsz", f"{int(imgsz[1])}x{int(imgsz[0])}"]
            else:
                cmd += ["--imgsz", str(imgsz)]
        if "streams" in kv:
            cmd += ["--streams", str(kv.pop("streams"))]
        return subprocess.call(cmd)
    if mode == "benchmark":
        from mo_yolo_tpu.utils.benchmarks import benchmark
        benchmark(imgsz=imgsz, **kv)
        return 0

    if task in ("sam", "fastsam"):
        return _segment_anything(task, mode, model_arg, imgsz, kv)
    if task in ("segment", "pose", "classify"):
        return _task_mode(task, mode, model_arg, imgsz, kv)

    if task == "detect":
        from mo_yolo_tpu.api import Detector as cls
        model_arg = model_arg or "yolo_track.yaml"
    elif task == "rtdetr":
        from mo_yolo_tpu.api import RTDETR as cls
        model_arg = model_arg or "detr_track.yaml"
    elif task == "nas":
        from mo_yolo_tpu.models.nas import NAS as cls
        model_arg = model_arg or "yolo_nas_s.yaml"
    else:
        from mo_yolo_tpu.api import MOTRTrack as cls
        model_arg = model_arg or "yolo_track.yaml"

    if task == "track":
        m = cls(model_arg, imgsz=imgsz, dtype=kv.pop("dtype", "bfloat16"))
    else:
        import inspect
        ckw = {}
        if "dtype" in kv and \
                "dtype" in inspect.signature(cls.__init__).parameters:
            ckw["dtype"] = kv.pop("dtype")
        m = cls(model_arg, imgsz=imgsz, **ckw)
        if mode == "predict":
            n = 0
            for r in m.predict(kv.pop("source"),
                               conf=kv.pop("conf", 0.25),
                               augment=bool(kv.pop("augment", False))):
                n += 1
                LOGGER.info(f"{r.path}: {len(r)} detections")
            LOGGER.info(f"processed {n} frames")
            return 0
        if mode == "track":
            # reference `yolo track`: detect + classic tracker
            # (`trackers/track.py`), conf forced to the BYTE low band
            if not hasattr(m, "track"):
                raise SystemExit(f"mode 'track' not supported for task "
                                 f"{task!r}")
            n = 0
            for r in m.track(kv.pop("source"),
                             conf=kv.pop("conf", 0.1),
                             tracker=str(kv.pop("tracker", "bytetrack"))):
                n += 1
                LOGGER.info(f"{r.path}: {len(r)} tracks")
            LOGGER.info(f"processed {n} frames")
            return 0
        if mode == "val":
            metrics = m.val(kv.pop("data"),
                            **route_kwargs(kv, m.val, allow_hyp=False))
            LOGGER.info(" ".join(f"{k}={v:.2f}" if isinstance(v, float)
                                 else f"{k}={v}"
                                 for k, v in metrics.items()))
            return 0
        if mode == "train":
            from mo_yolo_tpu.train.detect_trainer import DetectTrainer
            m.train(kv.pop("data"),
                    **route_kwargs(kv, m.train, DetectTrainer.__init__))
            return 0
        if mode == "tune" and hasattr(m, "tune"):
            from mo_yolo_tpu.train.detect_trainer import DetectTrainer
            out = m.tune(kv.pop("data"),
                         **route_kwargs(kv, m.tune, m.train,
                                        DetectTrainer.__init__))
            LOGGER.info(f"tune best fitness {out['best_fitness']:.4g} "
                        f"(trial {out['best_trial']}): {out['best_hyp']}")
            return 0
        raise SystemExit(f"mode {mode!r} not supported for task {task!r}")
    if mode in ("predict", "track"):
        # for the MOTR track task, `yolo track` IS streaming predict
        # (the tracker runs inside the device step)
        source = kv.pop("source")
        save_mot = kv.pop("save_mot", None)
        verbose = kv.pop("verbose", True)
        # reference predict `save_txt`/`save_conf` (engine/predictor.py
        # write_results -> Results.save_txt): one label txt per frame
        # under <save_dir>/labels
        save_txt = bool(kv.pop("save_txt", False))
        save_conf = bool(kv.pop("save_conf", False))
        save_dir = kv.pop("save_dir", "runs/track/predict")
        kv = route_kwargs(kv, m.predict, allow_hyp=False)
        kv.pop("save_dir", None)
        n = 0
        for r in m.predict(source, conf=kv.pop("conf", 0.5),
                           save_mot=save_mot,
                           vid_stride=int(kv.pop("vid_stride", 1)),
                           save=bool(kv.pop("save", False)),
                           save_crop=bool(kv.pop("save_crop", False)),
                           save_dir=save_dir,
                           line_width=int(kv.pop("line_width", 2)),
                           show_labels=bool(kv.pop("show_labels", True)),
                           show_conf=bool(kv.pop("show_conf", True)),
                           rect=bool(kv.pop("rect", False)),
                           visualize=bool(kv.pop("visualize", False)),
                           **kv):
            if save_txt:
                from pathlib import Path as _P
                stem = _P(r.path).stem if r.path else f"{n:06d}"
                lp = _P(save_dir) / "labels"
                lp.mkdir(parents=True, exist_ok=True)
                r.save_txt(str(lp / f"{stem}.txt"), save_conf=save_conf)
            n += 1
            if verbose:
                LOGGER.info(f"{r.path}: {len(r)} tracks "
                            f"({m and ''}{r.orig_shape})")
        LOGGER.info(f"processed {n} frames")
    elif mode == "val":
        # reference `profile`: benchmark the export formats alongside val
        profile = bool(kv.pop("profile", False))
        metrics = m.val(kv.pop("data"),
                        **route_kwargs(kv, m.val, allow_hyp=False))
        LOGGER.info(" ".join(f"{k}={v:.2f}" if isinstance(v, float) else
                             f"{k}={v}" for k, v in metrics.items()))
        if profile:
            from mo_yolo_tpu.utils.benchmarks import benchmark
            benchmark(m, imgsz=imgsz if isinstance(imgsz, int) else 256,
                      formats=["live", "params", "jaxexport"], n_iter=3)
    elif mode == "train":
        from mo_yolo_tpu.train.trainer import TrackTrainer
        m.train(kv.pop("data"),
                **route_kwargs(kv, m.train, TrackTrainer.__init__))
    elif mode == "tune":
        from mo_yolo_tpu.train.trainer import TrackTrainer
        out = m.tune(kv.pop("data"),
                     **route_kwargs(kv, m.tune, m.train,
                                    TrackTrainer.__init__))
        LOGGER.info(f"tune best fitness {out['best_fitness']:.4g} "
                    f"(trial {out['best_trial']}): {out['best_hyp']}")
    elif mode == "export":
        out = m.export(fmt=kv.pop("format", "stablehlo"),
                       path=kv.pop("path", "model_export"),
                       **route_kwargs(kv, m.export, allow_hyp=False))
        LOGGER.info(f"exported to {out}")
    return 0


def _task_mode(task, mode, model_arg, imgsz, kv):
    """`segment`/`pose`/`classify` train|val|predict through the task
    facade (reference `yolo segment train data=... model=...` etc.,
    `cfg/__init__.py entrypoint` task routing)."""
    import inspect

    from mo_yolo_tpu.api import _TaskModel

    init_params = set(inspect.signature(_TaskModel.__init__).parameters) \
        - {"self", "task"}
    ikw = {k: kv.pop(k) for k in list(kv) if k in init_params}
    m = _TaskModel(task, model_arg or "yolo_track.yaml", imgsz=imgsz, **ikw)
    if mode == "train":
        from mo_yolo_tpu.train.task_trainers import (ClassifyTrainer,
                                                     PoseTrainer,
                                                     SegTrainer,
                                                     _TaskTrainer)
        trainer = {"segment": SegTrainer, "pose": PoseTrainer,
                   "classify": ClassifyTrainer}[task]
        # subclass __init__s hide the base surface behind *a/**kw — route
        # against both signatures
        out = m.train(kv.pop("data"),
                      **route_kwargs(kv, trainer.__init__,
                                     _TaskTrainer.__init__))
        LOGGER.info(f"{task} training done: {out}")
        return 0
    if mode == "tune":
        from mo_yolo_tpu.train.task_trainers import _TaskTrainer
        out = m.tune(kv.pop("data"),
                     **route_kwargs(kv, m.tune, _TaskTrainer.__init__))
        LOGGER.info(f"tune best fitness {out['best_fitness']:.4g} "
                    f"(trial {out['best_trial']}): {out['best_hyp']}")
        return 0
    if mode == "val":
        metrics = m.val(kv.pop("data"))
        LOGGER.info(" ".join(f"{k}={v:.3f}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in metrics.items()))
        return 0
    if mode == "predict":
        from pathlib import Path as _P
        n = 0
        save = bool(kv.pop("save", False))
        save_dir = str(kv.pop("save_dir", f"runs/{task}/predict"))
        for path, res in m.predict(kv.pop("source"), as_results=True):
            if res.probs is not None:
                top = int(res.probs.argmax())
                LOGGER.info(f"{path}: top1 class {top} "
                            f"({float(res.probs[top]):.3f})")
            else:
                LOGGER.info(f"{path}: {len(res)} detections")
            if save:
                res.save(_P(save_dir) / f"{_P(str(path)).stem}.jpg")
            n += 1
        LOGGER.info(f"processed {n} frames")
        return 0
    raise SystemExit(f"mode {mode!r} not supported for task {task!r}")


def _segment_anything(task, mode, model_arg, imgsz, kv):
    """`sam`/`fastsam` predict: everything-mode or prompted segmentation,
    masks + boxes logged (reference `yolo sam predict source=...`)."""
    if mode != "predict":
        raise SystemExit(f"task {task!r} supports only predict")
    from mo_yolo_tpu.data.loaders import make_source

    if task == "sam":
        from mo_yolo_tpu.models.sam import SAM
        m = SAM(variant=str(model_arg or "b"), img_size=imgsz)
        weights = kv.pop("weights", None)
        if weights:
            m.load_torch(weights)
    else:
        from mo_yolo_tpu.models.fastsam import FastSAM
        m = FastSAM(str(model_arg or "yolo_track.yaml"), imgsz=imgsz)
    texts = kv.pop("texts", None)   # CLIP text prompt (prompt.py:395)
    n = 0
    for path, img in make_source(kv.pop("source")):
        if texts is not None:
            out = (m.text_prompt(img, texts, grid=kv.get("grid", 8))
                   if task == "sam" else m(img, texts=texts))
        elif task == "sam":
            out = m.generate(img, grid=kv.get("grid", 8))
        else:
            out = m.everything(img)
        LOGGER.info(f"{path}: {len(out['masks'])} masks")
        n += 1
    LOGGER.info(f"processed {n} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
