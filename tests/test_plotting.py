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
