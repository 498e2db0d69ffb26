"""HUB client — model/dataset registry with the reference's API surface.

The reference HUB (`ultralytics/hub/__init__.py`: login/logout/start/
export_model/check_dataset, `auth.py`, `session.py`) is a client for a
proprietary web service. A TPU production deployment is typically
air-gapped from it, so this re-design keeps the exact entry points but
targets a pluggable artifact registry (local directory or file:// URL —
e.g. an NFS/GCS-fuse mount shared across pod workers) with sha256
integrity, and streams training telemetry through the in-process
callbacks bus instead of HTTP heartbeats.
"""

from __future__ import annotations

from mo_yolo_tpu.hub.auth import Auth, login, logout
from mo_yolo_tpu.hub.registry import Registry
from mo_yolo_tpu.hub.session import TrainingSession

__all__ = ["Auth", "Registry", "TrainingSession", "login", "logout",
           "start", "export_model", "export_fmts_hub", "check_dataset",
           "reset_model"]


def start(key: str = "", model: str = "yolo_track.yaml", **train_kw):
    """Start a registry-tracked training run (reference `hub/__init__.py:38`
    `start`: fetch session, train, stream). Returns the trained API object;
    telemetry lands in the registry under runs/<model_id>/."""
    auth = login(key) if key else Auth()
    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack(model)
    reg = Registry()
    sess = TrainingSession(reg, model_id=train_kw.pop("model_id", "run"))
    data = train_kw.pop("data", None)
    if data is None:
        raise ValueError("start() needs data=<dataset yaml>")
    cb = train_kw.setdefault("callbacks", None)
    from mo_yolo_tpu.utils.callbacks import default_callbacks
    bus = cb or default_callbacks(train_kw.get("save_dir", "runs/track"))
    sess.attach(bus)
    train_kw["callbacks"] = bus
    m.train(data, **train_kw)
    sess.upload_final(m)
    return m


def export_fmts_hub():
    """Formats this deployment can produce (reference lists the torch zoo)."""
    return ["stablehlo", "jaxexport", "params", "saved_model", "tflite"]


def export_model(model_id: str = "", format: str = "jaxexport"):
    """Pull a model from the registry, export it, push the artifact back
    (reference `hub/__init__.py:72` posts an export request)."""
    if format not in export_fmts_hub():
        raise ValueError(f"unsupported format {format!r}; "
                         f"one of {export_fmts_hub()}")
    reg = Registry()
    from mo_yolo_tpu.api import MOTRTrack

    local = reg.pull(model_id)
    m = MOTRTrack(str(local))
    out = m.export(format, path=str(local) + f".export.{format}")
    return reg.push(f"{model_id}.{format}", out)


def reset_model(model_id: str = ""):
    """Drop a model's artifacts from the registry (reference resets the
    server-side training state)."""
    Registry().delete(model_id)


def check_dataset(path: str = "", task: str = "track"):
    """Validate a dataset yaml before registry upload (reference
    `hub/__init__.py:94` -> HUBDatasetStats). Returns a stats dict."""
    from mo_yolo_tpu.data.dataset import load_dataset_yaml

    d = load_dataset_yaml(path)
    stats = {"task": task, "nc": len(d.get("names", {})),
             "train": len(d.get("train", [])), "val": len(d.get("val", []))}
    missing = [s for s in ("train", "val") if not d.get(s)]
    stats["ok"] = not missing
    if missing:
        stats["missing"] = missing
    return stats
