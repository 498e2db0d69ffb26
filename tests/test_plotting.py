"""Plotting + logger-integration tests (reference `utils/plotting.py` and
`utils/callbacks/tensorboard.py` equivalents)."""

import numpy as np


def test_plot_results(tmp_path):
    from mo_yolo_tpu.utils.plotting import plot_results

    csv = tmp_path / "results.csv"
    csv.write_text("epoch,step,loss,grad_norm\n0,0,10.0,5.0\n0,10,8.0,4.0\n"
                   "1,0,6.5,3.0\n")
    out = plot_results(str(csv))
    assert out.endswith("results.png")
    from pathlib import Path
    assert Path(out).stat().st_size > 1000


def test_plot_labels_and_grid_and_cm(tmp_path):
    from mo_yolo_tpu.utils.plotting import (plot_confusion_matrix,
                                            plot_image_grid, plot_labels)

    rng = np.random.default_rng(0)
    p1 = plot_labels(rng.integers(0, 3, 50), rng.uniform(0.1, 0.9, (50, 4)),
                     str(tmp_path / "labels.png"), names={0: "a", 1: "b", 2: "c"})
    imgs = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(3)]
    boxes = [np.array([[2, 2, 20, 20]]) for _ in range(3)]
    ids = [np.array([7]) for _ in range(3)]
    p2 = plot_image_grid(imgs, boxes, str(tmp_path / "grid.png"), ids)
    p3 = plot_confusion_matrix(np.array([[5, 1, 0], [0, 4, 1], [1, 0, 0]]),
                               str(tmp_path / "cm.png"), names=["a", "b"])
    from pathlib import Path
    for p in (p1, p2, p3):
        assert Path(p).stat().st_size > 1000


def test_correlogram_and_train_batch(tmp_path):
    """New reference-parity plots: labels_correlogram.jpg (seaborn
    pairplot equivalent) and the train_batch{N}.jpg mosaic wiring."""
    from pathlib import Path

    from mo_yolo_tpu.utils.plotting import (plot_labels_correlogram,
                                            save_train_batch)

    rng = np.random.default_rng(1)
    p1 = plot_labels_correlogram(rng.uniform(0.1, 0.9, (80, 4)),
                                 str(tmp_path / "labels_correlogram.jpg"))
    imgs = rng.random((4, 32, 48, 3)).astype(np.float32)
    boxes = np.zeros((4, 5, 4), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.6]          # one real box per image
    mask = np.zeros((4, 5), bool)
    mask[:, 0] = True
    ids = np.full((4, 5), -1)
    ids[:, 0] = 3
    p2 = save_train_batch(imgs, boxes, str(tmp_path / "train_batch0.jpg"),
                          ids=ids, mask=mask)
    for p in (p1, p2):
        assert Path(p).stat().st_size > 1000


def test_trainer_plot_wiring(tmp_path):
    """The TrackTrainer plot hooks produce the reference artifacts
    (labels.jpg / labels_correlogram.jpg / train_batch{i}.jpg) from a
    stub dataset and a real clip batch — no training required."""
    from pathlib import Path

    from mo_yolo_tpu.train.trainer import TrackTrainer

    t = TrackTrainer.__new__(TrackTrainer)   # wiring-only: skip __init__
    t.save_dir = Path(tmp_path)

    class DS:
        def __len__(self):
            return 3

        def _label(self, i):
            rng = np.random.default_rng(i)
            n = 2 + i
            return np.concatenate(
                [rng.integers(0, 3, (n, 1)).astype(np.float32),
                 rng.uniform(0.2, 0.8, (n, 4)).astype(np.float32),
                 np.arange(n, dtype=np.float32)[:, None]], axis=1)

    t._plot_labels(DS())
    T, B, G = 2, 2, 4
    clip = {
        "images": np.random.default_rng(0).random((T, B, 32, 32, 3),
                                                  ).astype(np.float32),
        "gt_boxes": np.tile([0.5, 0.5, 0.3, 0.3],
                            (T, B, G, 1)).astype(np.float32),
        "gt_track_id": np.tile(np.arange(G), (T, B, 1)),
        "gt_mask": np.tile([True, True, False, False], (T, B, 1)),
    }
    t._plot_train_batch(clip, 0)
    for name in ("labels.jpg", "labels_correlogram.jpg", "train_batch0.jpg"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 1000, name


def test_tensorboard_logger(tmp_path):
    from mo_yolo_tpu.utils.callbacks import TensorBoardLogger

    tb = TensorBoardLogger(str(tmp_path / "tb"), every=1)
    if tb.writer is None:
        import pytest
        pytest.skip("tensorboardX unavailable")
    tb.on_batch(step=0, metrics={"loss": 1.5})
    tb.on_epoch(epoch=0, metrics={"HOTA": 50.0})
    tb.close()
    files = list((tmp_path / "tb").glob("events*"))
    assert files and files[0].stat().st_size > 0


def test_default_callbacks_includes_tb(tmp_path):
    from mo_yolo_tpu.utils.callbacks import default_callbacks

    bus = default_callbacks(str(tmp_path))
    bus.fire("on_train_batch_end", step=0, metrics={"loss": 2.0})
    bus.fire("on_train_epoch_end", trainer=None, epoch=0,
             metrics={"HOTA": 1.0})
    bus.fire("on_train_end", trainer=None, metrics={})
    assert (tmp_path / "events.jsonl").exists()


def test_remaining_callback_integrations_with_fake_modules(monkeypatch):
    """Comet/ClearML/Neptune/DVC adapters (reference callbacks/{comet,
    clearml,neptune,dvc}.py): each activates only with its package +
    credentials, logs params at start and scalar metrics per epoch, and
    closes at end — verified against in-memory fake SDKs."""
    import sys
    import types

    from mo_yolo_tpu.utils.callbacks import (
        ClearMLLogger, CometLogger, DVCLogger, NeptuneLogger)

    calls = {"comet": [], "clearml": [], "neptune": [], "dvc": []}

    class FakeExp:
        def log_parameters(self, p):
            calls["comet"].append(("params", dict(p)))

        def log_metrics(self, m, epoch=None):
            calls["comet"].append(("metrics", m, epoch))

        def end(self):
            calls["comet"].append(("end",))

    comet = types.ModuleType("comet_ml")
    comet.Experiment = lambda project_name: FakeExp()
    monkeypatch.setitem(sys.modules, "comet_ml", comet)
    monkeypatch.setenv("COMET_API_KEY", "x")

    class FakeLogger:
        def report_scalar(self, a, b, v, it):
            calls["clearml"].append(("scalar", b, v, it))

    class FakeTask:
        def connect(self, p):
            calls["clearml"].append(("connect", dict(p)))

        def get_logger(self):
            return FakeLogger()

        def close(self):
            calls["clearml"].append(("close",))

    clearml = types.ModuleType("clearml")
    clearml.Task = types.SimpleNamespace(
        init=lambda project_name, task_name: FakeTask())
    monkeypatch.setitem(sys.modules, "clearml", clearml)
    monkeypatch.setenv("CLEARML_API_HOST", "http://x")

    class FakeSeries:
        def __init__(self, key):
            self.key = key

        def append(self, v, step=None):
            calls["neptune"].append(("append", self.key, v, step))

    class FakeRun(dict):
        def __setitem__(self, k, v):
            calls["neptune"].append(("set", k))

        def __getitem__(self, k):
            return FakeSeries(k)

        def stop(self):
            calls["neptune"].append(("stop",))

    neptune = types.ModuleType("neptune")
    neptune.init_run = lambda project: FakeRun()
    monkeypatch.setitem(sys.modules, "neptune", neptune)
    monkeypatch.setenv("NEPTUNE_API_TOKEN", "t")

    class FakeLive:
        def __init__(self, d, save_dvc_exp=False):
            pass

        def log_param(self, k, v):
            calls["dvc"].append(("param", k))

        def log_metric(self, k, v):
            calls["dvc"].append(("metric", k, v))

        def next_step(self):
            calls["dvc"].append(("step",))

        def end(self):
            calls["dvc"].append(("end",))

    dvclive = types.ModuleType("dvclive")
    dvclive.Live = FakeLive
    monkeypatch.setitem(sys.modules, "dvclive", dvclive)

    class FakeTrainer:
        def __init__(self):
            self.epochs = 3
            self.lr = 0.001

    tr = FakeTrainer()
    metrics = {"HOTA": 61.5, "mAP50": 0.8, "names": ["a"]}
    for lg in (CometLogger(), ClearMLLogger(), NeptuneLogger(),
               DVCLogger("/tmp/dvclive_test")):
        lg.on_start(trainer=tr)
        lg.on_epoch(epoch=2, metrics=metrics)
        lg.on_end()

    assert ("params", {"epochs": 3, "lr": 0.001}) in calls["comet"]
    assert ("metrics", {"HOTA": 61.5, "mAP50": 0.8}, 2) in calls["comet"]
    assert ("end",) in calls["comet"]
    assert ("connect", {"epochs": 3, "lr": 0.001}) in calls["clearml"]
    assert ("scalar", "HOTA", 61.5, 2) in calls["clearml"]
    assert ("close",) in calls["clearml"]
    assert ("append", "val/HOTA", 61.5, 2) in calls["neptune"]
    assert ("stop",) in calls["neptune"]
    assert ("metric", "val/mAP50", 0.8) in calls["dvc"]
    assert ("step",) in calls["dvc"] and ("end",) in calls["dvc"]

    # without credentials each stays inert
    for var in ("COMET_API_KEY", "CLEARML_API_HOST", "NEPTUNE_API_TOKEN"):
        monkeypatch.delenv(var)
    assert CometLogger().exp is None
    assert ClearMLLogger().task is None
    assert NeptuneLogger().run is None


def test_raytune_callback_with_fake_session(monkeypatch):
    """RayTune adapter (reference callbacks/raytune.py): reports epoch
    metrics to an active Tune session; inert without one."""
    import sys
    import types

    reported = []
    ray = types.ModuleType("ray")
    tune = types.ModuleType("ray.tune")
    tune.is_session_enabled = lambda: True
    air = types.ModuleType("ray.air")
    sess = types.ModuleType("ray.air.session")
    sess.report = lambda d: reported.append(d)
    air.session = sess
    ray.tune = tune
    ray.air = air
    for n, m in [("ray", ray), ("ray.tune", tune), ("ray.air", air),
                 ("ray.air.session", sess)]:
        monkeypatch.setitem(sys.modules, n, m)

    from mo_yolo_tpu.utils.callbacks import RayTuneLogger

    lg = RayTuneLogger()
    assert lg.tune is not None
    lg.on_epoch(epoch=3, metrics={"HOTA": 50.0, "names": ["x"]})
    assert reported == [{"HOTA": 50.0, "epoch": 3}]

    tune.is_session_enabled = lambda: False
    assert RayTuneLogger().tune is None
