"""Export-format benchmark harness.

Equivalent of the reference `utils/benchmarks.py` (360 LoC: exports a
model to each format, runs inference, and tabulates status/size/latency).
Scoped to the formats this framework produces (`api.export`): live jit,
orbax `params`, serialized `jaxexport` AOT artifacts, and (when
TensorFlow is present) SavedModel/TFLite. Each row reports export
success, artifact size, per-frame latency, and numeric agreement with
the live model — an export that runs but disagrees is a FAIL, not a
slower row (`benchmarks.py:78-96` only checks mAP similarity; exactness
is checkable here because the compiled function is deterministic).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from mo_yolo_tpu.utils.logging import LOGGER


def _dir_bytes(p: Path) -> int:
    if p.is_file():
        return p.stat().st_size
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def benchmark(model=None, imgsz: int = 256, formats: Optional[List[str]] = None,
              out_dir: str = "runs/benchmark", n_iter: int = 5,
              atol: float = 2e-2) -> List[Dict]:
    """Benchmark every export format end-to-end. Returns a list of row
    dicts {format, ok, size_mb, ms_per_frame, max_err} and logs a table."""
    import jax
    import jax.numpy as jnp

    from mo_yolo_tpu.api import MOTRTrack
    from mo_yolo_tpu.engine.autobackend import AutoBackend

    if model is None:
        model = MOTRTrack("yolo_track.yaml", imgsz=imgsz)
    if formats is None:
        formats = ["live", "params", "jaxexport", "saved_model", "tflite"]

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 1, (1, imgsz, imgsz, 3)),
                        jnp.float32)

    # reference outputs from the live model
    live = AutoBackend((model.model, model.variables), imgsz=imgsz)
    st0 = live.new_state()
    _, ref_out = live.stream_step(st0, frame)
    ref = np.asarray(ref_out, np.float32)

    rows: List[Dict] = []
    for fmt in formats:
        row = {"format": fmt, "ok": False, "size_mb": None,
               "ms_per_frame": None, "max_err": None}
        try:
            if fmt == "live":
                backend, artifact = live, None
            elif fmt == "params":
                path = model.export("params", path=str(out / "weights"))
                backend = AutoBackend(path, imgsz=imgsz)
                artifact = Path(path)
            elif fmt == "jaxexport":
                path = model.export("jaxexport", path=str(out / "model"))
                backend = AutoBackend(path, imgsz=imgsz)
                artifact = Path(path)
            elif fmt in ("saved_model", "tflite"):
                try:
                    import tensorflow  # noqa: F401
                except ImportError:
                    row["note"] = "tensorflow not installed"
                    rows.append(row)
                    continue
                path = model.export(fmt, path=str(out / f"model_{fmt}"))
                backend = AutoBackend(path, imgsz=imgsz)
                artifact = Path(path)
            else:
                row["note"] = f"unknown format {fmt}"
                rows.append(row)
                continue

            st = backend.new_state()
            _, o = backend.stream_step(st, frame)      # compile+check
            err = float(np.max(np.abs(np.asarray(o, np.float32) - ref)))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                st2, o = backend.stream_step(st, frame)
            np.asarray(o)                              # sync
            dt = (time.perf_counter() - t0) / n_iter * 1000
            row.update(ok=err <= atol, ms_per_frame=round(dt, 2),
                       max_err=round(err, 5))
            if artifact is not None:
                row["size_mb"] = round(_dir_bytes(artifact) / 1e6, 2)
        except Exception as e:  # a broken exporter is a row, not a crash
            row["note"] = f"{type(e).__name__}: {e}"
        rows.append(row)

    w = max(len(r["format"]) for r in rows)
    LOGGER.info(f"{'format':<{w}}  ok     size_mb  ms/frame  max_err")
    for r in rows:
        LOGGER.info(f"{r['format']:<{w}}  {str(r['ok']):<5}  "
                    f"{r['size_mb'] if r['size_mb'] is not None else '-':<7}  "
                    f"{r['ms_per_frame'] if r['ms_per_frame'] is not None else '-':<8}  "
                    f"{r['max_err'] if r['max_err'] is not None else '-'}")
    return rows
