"""Callback event bus + lifecycle wiring.

The reference fires a 26-event bus from every trainer/validator/
predictor/exporter (`utils/callbacks/base.py:148-178`) and exposes
add_callback/clear_callback/reset_callbacks on the Model facade
(`engine/model.py:660-697`). These tests pin (a) the bus semantics,
(b) that user callbacks added on a facade actually fire through train /
predict / export, across task families — not just TrackTrainer."""

import numpy as np
import pytest


class Recorder:
    """Appends (event, kwargs-keys) per fire; one instance per test."""

    def __init__(self):
        self.events = []

    def hook(self, event):
        def fn(**kw):
            self.events.append((event, sorted(kw)))
        return fn

    def names(self):
        return [e for e, _ in self.events]


def test_bus_semantics():
    from mo_yolo_tpu.utils.callbacks import EVENTS, CallbackBus

    bus = CallbackBus()
    rec = Recorder()
    with pytest.raises(KeyError):
        bus.add("no_such_event", rec.hook("x"))
    bus.add("on_train_start", rec.hook("on_train_start"))
    bus.fire("on_train_start", trainer=None)
    bus.fire("on_train_end")                  # no listeners: no-op
    assert rec.events == [("on_train_start", ["trainer"])]

    # merge appends the other bus's listeners (facade -> trainer)
    other = CallbackBus()
    other.add("on_train_start", rec.hook("merged"))
    bus.merge(other)
    bus.fire("on_train_start")
    assert rec.names() == ["on_train_start", "on_train_start", "merged"]

    # clear(event) drops one event, clear() drops all
    bus.clear("on_train_start")
    bus.fire("on_train_start")
    assert len(rec.events) == 3
    bus.add("teardown", rec.hook("teardown"))
    bus.clear()
    bus.fire("teardown")
    assert len(rec.events) == 3
    # every reference lifecycle event name is present
    for ev in ("on_train_start", "on_val_start", "on_predict_start",
               "on_export_start", "on_fit_epoch_end", "teardown"):
        assert ev in EVENTS


def test_classify_trainer_fires_lifecycle(tmp_path):
    """A non-track trainer (ClassifyTrainer) fires the same train
    lifecycle as TrackTrainer: start -> batch_end* -> epoch_end -> end."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.heads_extra import ClassifyModel
    from mo_yolo_tpu.train.task_trainers import ClassifyTrainer
    from mo_yolo_tpu.utils.callbacks import CallbackBus

    for ci, color in enumerate([(255, 0, 0), (0, 0, 255)]):
        (tmp_path / "tree" / f"c{ci}").mkdir(parents=True)
        img = np.zeros((64, 64, 3), np.uint8)
        img[...] = color
        Image.fromarray(img).save(tmp_path / "tree" / f"c{ci}" / "0.jpg")

    spec = parse_model_yaml("tests/tiny_track.yaml", nc=2)
    model = ClassifyModel(spec=spec, nc=2, c_=64)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rec = Recorder()
    bus = CallbackBus()
    for ev in ("on_train_start", "on_train_batch_end",
               "on_train_epoch_end", "on_train_end"):
        bus.add(ev, rec.hook(ev))
    t = ClassifyTrainer(model, v, str(tmp_path / "tree"), epochs=1,
                        batch=2, imgsz=64, save_dir=str(tmp_path / "run"),
                        callbacks=bus)
    t.run()
    names = rec.names()
    assert names[0] == "on_train_start"
    assert names[-1] == "on_train_end"
    assert "on_train_batch_end" in names and "on_train_epoch_end" in names
    assert names.index("on_train_batch_end") \
        < names.index("on_train_epoch_end")
    # batch_end carries step+metrics (what TB/W&B throttled loggers read)
    kw = dict(rec.events)["on_train_batch_end"]
    assert "step" in kw and "metrics" in kw


def test_facade_callback_surface_and_export_events(tmp_path):
    """Reference Model surface: add_callback on the facade fires through
    export (on_export_start/end) and predict (on_predict_*)."""
    import jax

    from mo_yolo_tpu.api import MOTRTrack

    m = MOTRTrack("tests/tiny_track.yaml", imgsz=64)
    rec = Recorder()
    for ev in ("on_export_start", "on_export_end", "on_predict_start",
               "on_predict_batch_end", "on_predict_end"):
        m.add_callback(ev, rec.hook(ev))

    out = m.export("params", path=str(tmp_path / "w"))
    assert rec.names() == ["on_export_start", "on_export_end"]
    assert out == str(tmp_path / "w")

    # predict: facade bus rides into TrackPredictor (2-frame source)
    rec.events.clear()
    frames = [np.full((64, 64, 3), 128, np.uint8)] * 2
    list(m.predict(frames, conf=0.0))
    names = rec.names()
    assert names[0] == "on_predict_start"
    assert names.count("on_predict_batch_end") == 2
    assert names[-1] == "on_predict_end"

    # clear_callback / reset_callbacks (reference Model methods)
    rec.events.clear()
    m.clear_callback("on_predict_batch_end")
    list(m.predict(frames[:1], conf=0.0))
    assert "on_predict_batch_end" not in rec.names()
    m.reset_callbacks()
    rec.events.clear()
    m.export("params", path=str(tmp_path / "w2"))
    assert rec.events == []


def test_validator_fires_val_events(tmp_path):
    """SegmentationValidator (standalone, the non-track family) fires
    on_val_start/on_val_end with the metrics dict."""
    import jax
    import jax.numpy as jnp
    import yaml
    from PIL import Image

    from mo_yolo_tpu.engine.validator import SegmentationValidator
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.heads_extra import SegmentationModel
    from mo_yolo_tpu.utils.callbacks import CallbackBus

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    img = np.full((64, 64, 3), 60, np.uint8)
    img[16:48, 16:48] = 200
    Image.fromarray(img).save(tmp_path / "images" / "0.jpg")
    (tmp_path / "labels" / "0.txt").write_text(
        "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")

    spec = parse_model_yaml("tests/tiny_track.yaml", nc=2)
    model = SegmentationModel(spec=spec, max_det=8)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rec = Recorder()
    bus = CallbackBus()
    bus.add("on_val_start", rec.hook("on_val_start"))
    bus.add("on_val_end", rec.hook("on_val_end"))
    SegmentationValidator(model, v, imgsz=64, callbacks=bus)(
        [str(tmp_path / "images" / "0.jpg")])
    assert rec.names() == ["on_val_start", "on_val_end"]
    assert "metrics" in dict(rec.events)["on_val_end"]
