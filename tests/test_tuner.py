"""Hyperparameter tuner (reference `utils/tuner.py:run_ray_tune` +
`engine/model.py:396-408 Model.tune`): sampling, fitness extraction,
successive-halving schedule, artifacts, and the API facade wiring."""

import json
import math
import random
from pathlib import Path

import numpy as np
import pytest

from mo_yolo_tpu.utils.tuner import (DEFAULT_SPACE, Tuner, fitness_of,
                                     sample_hyp)


def test_sample_hyp_bounds_and_log():
    rng = random.Random(0)
    space = {"lr": (1e-5, 1e-1, "log"), "lrf": (0.01, 1.0),
             "optimizer": ["sgd", "adamw"], "fixed": 7}
    lrs = []
    for _ in range(200):
        h = sample_hyp(space, rng)
        assert 1e-5 <= h["lr"] <= 1e-1
        assert 0.01 <= h["lrf"] <= 1.0
        assert h["optimizer"] in ("sgd", "adamw")
        assert h["fixed"] == 7
        lrs.append(h["lr"])
    # log-uniform: the median sits near the geometric mean (1e-3), orders
    # of magnitude below the arithmetic midpoint (~0.05)
    assert np.median(lrs) < 1e-2


def test_fitness_priority():
    assert fitness_of({"HOTA": 50.0, "final_loss": 2.0}) == 50.0
    assert fitness_of({"mAP50-95": 0.3, "mAP50": 0.5}) == 0.3
    assert fitness_of({"final_loss": 2.0}) == -2.0
    assert fitness_of({}) == -float("inf")
    assert fitness_of({"HOTA": float("nan"), "final_loss": 1.0}) == -1.0


def test_tuner_picks_best_and_writes_artifacts(tmp_path):
    calls = []

    def train_fn(hyp, epochs, save_dir, resume):
        calls.append((epochs, resume))
        # fitness peaks at lr = 1e-3 (quadratic in log-space)
        return {"fitness": -abs(math.log10(hyp["lr"]) + 3.0)}

    t = Tuner(train_fn, space={"lr": (1e-5, 1e-1, "log")},
              max_samples=8, seed=0, save_dir=str(tmp_path))
    out = t(epochs=2)
    fits = [r["fitness"] for r in out["results"]]
    assert out["best_fitness"] == max(fits)
    assert abs(math.log10(out["best_hyp"]["lr"]) + 3.0) == -out["best_fitness"]
    assert all(e == 2 and not r for e, r in calls)  # no halving: full budget
    assert (tmp_path / "tune_results.csv").exists()
    assert (tmp_path / "tune_results.json").exists()
    txt = (tmp_path / "best_hyperparameters.yaml").read_text()
    assert "lr:" in txt
    rows = json.loads((tmp_path / "tune_results.json").read_text())
    assert len(rows) == 8 and not any(r["stopped"] for r in rows)
    # scatter artifact (reference tune_scatter_plots.png)
    assert (tmp_path / "tune_scatter_plots.png").exists()


def test_tuner_successive_halving_schedule(tmp_path):
    """grace_period=1, reduction=2, epochs=4 -> rungs [1, 2, 4]; 8 trials
    shrink 8 -> 4 -> 2, survivors continue with resume=True."""
    log = []

    def train_fn(hyp, epochs, save_dir, resume):
        log.append((Path(save_dir).name, epochs, resume))
        return {"fitness": hyp["x"]}     # fitness == sampled x

    t = Tuner(train_fn, space={"x": (0.0, 1.0)}, max_samples=8,
              grace_period=1, reduction=2, seed=1, save_dir=str(tmp_path))
    out = t(epochs=4)
    by_budget = {}
    for name, e, r in log:
        by_budget.setdefault(e, []).append((name, r))
    assert sorted(by_budget) == [1, 2, 4]
    assert len(by_budget[1]) == 8 and len(by_budget[2]) == 4 \
        and len(by_budget[4]) == 2
    assert all(not r for _, r in by_budget[1])        # first rung: fresh
    assert all(r for _, r in by_budget[2] + by_budget[4])  # continuations
    # survivors are exactly the highest-fitness trials
    fits = {f"trial_{r['trial']}": r["fitness"] for r in out["results"]}
    top4 = sorted(fits, key=fits.get, reverse=True)[:4]
    assert {n for n, _ in by_budget[2]} == set(top4)
    assert sum(r["stopped"] for r in out["results"]) == 6
    assert out["best_fitness"] == max(fits.values())


def test_tuner_survives_failing_trial(tmp_path):
    def train_fn(hyp, epochs, save_dir, resume):
        if hyp["x"] > 0.5:
            raise RuntimeError("diverged")
        return {"fitness": hyp["x"]}

    t = Tuner(train_fn, space={"x": (0.0, 1.0)}, max_samples=6, seed=0,
              save_dir=str(tmp_path))
    out = t(epochs=1)
    assert math.isfinite(out["best_fitness"])
    assert out["best_hyp"]["x"] <= 0.5


def test_tuner_late_rung_failure_keeps_earned_fitness(tmp_path):
    """A trial that fails at a LATER rung keeps the fitness it earned at
    the earlier rung (regression: it was overwritten with -inf, ranking a
    good-but-transiently-failing trial below never-promoted ones)."""
    def train_fn(hyp, epochs, save_dir, resume):
        if resume:                      # second rung: transient failure
            raise RuntimeError("OOM")
        return {"fitness": hyp["x"]}

    t = Tuner(train_fn, space={"x": (0.0, 1.0)}, max_samples=4,
              grace_period=1, reduction=2, seed=3, save_dir=str(tmp_path))
    out = t(epochs=4)
    fits = [r["fitness"] for r in out["results"]]
    assert all(math.isfinite(f) for f in fits), fits
    # best is still the top rung-0 scorer, with its rung-0 fitness intact
    assert out["best_fitness"] == max(fits)


def test_tuner_raises_when_all_trials_fail(tmp_path):
    """A configuration error (every trial fails identically) must
    surface the real exception, not return best_fitness=-inf."""
    def train_fn(hyp, epochs, save_dir, resume):
        raise ValueError("tune() needs a yaml-built model")

    t = Tuner(train_fn, space={"x": (0.0, 1.0)}, max_samples=3, seed=0,
              save_dir=str(tmp_path))
    with pytest.raises(RuntimeError, match="yaml-built model"):
        t(epochs=1)


def test_tuner_rejects_bad_max_samples(tmp_path):
    with pytest.raises(ValueError, match="max_samples"):
        Tuner(lambda *a: {}, max_samples=0, save_dir=str(tmp_path))


def test_tune_spaces_match_honored_keys():
    """Facade default spaces only sample dimensions their trainers
    honor; track/detect tuning trains with augmentation ON so the
    sampled augment dims affect fitness."""
    from mo_yolo_tpu.api import MOTRTrack, _TaskModel

    assert MOTRTrack._tune_train_augment is True
    seg = object.__new__(_TaskModel)
    seg.task = "segment"
    assert set(seg._tune_space(None)) == {"lr", "box", "cls", "dfl"}
    pose = object.__new__(_TaskModel)
    pose.task = "pose"
    assert {"pose", "kobj"} < set(pose._tune_space(None))
    clf = object.__new__(_TaskModel)
    clf.task = "classify"
    assert set(clf._tune_space(None)) == {"lr", "label_smoothing"}


def test_route_tune_hyp_facades():
    """Key routing: TrackTrainer ctor keys stay top-level, the rest nest
    under hyp; Detector routes everything but lr into hyp."""
    from mo_yolo_tpu.api import Detector, MOTRTrack

    h = {"lr": 0.01, "lrf": 0.1, "momentum": 0.9, "warmup_epochs": 1.0,
         "degrees": 5.0, "fliplr": 0.5}
    kt = MOTRTrack._route_tune_hyp(object.__new__(MOTRTrack), h)
    assert kt["lr"] == 0.01 and kt["momentum"] == 0.9
    assert kt["hyp"] == {"degrees": 5.0, "fliplr": 0.5}
    kd = Detector._route_tune_hyp(object.__new__(Detector), h)
    assert kd["lr"] == 0.01
    assert kd["hyp"] == {"lrf": 0.1, "momentum": 0.9, "warmup_epochs": 1.0,
                         "degrees": 5.0, "fliplr": 0.5}


def test_track_default_space_drops_multi_image_augs():
    assert {"mosaic", "mixup", "copy_paste"} < set(DEFAULT_SPACE)


def test_cli_has_tune_mode():
    from mo_yolo_tpu.cli import MODES
    assert "tune" in MODES


def test_task_model_tune_classify(tmp_path):
    """tune() on the task facade (classify): 2 trials x 1 epoch over a
    2-class color tree, artifacts + finite fitness."""
    from PIL import Image

    from mo_yolo_tpu.api import _TaskModel

    for ci, color in enumerate([(255, 0, 0), (0, 0, 255)]):
        (tmp_path / "tree" / f"c{ci}").mkdir(parents=True)
        for i in range(4):
            img = np.zeros((64, 64, 3), np.uint8)
            img[...] = color
            Image.fromarray(img).save(
                tmp_path / "tree" / f"c{ci}" / f"{i}.jpg")
    m = _TaskModel("classify", "tests/tiny_track.yaml", nc=2, imgsz=64)
    out = m.tune(str(tmp_path / "tree"), epochs=1, max_samples=2, seed=0,
                 space={"lr": (1e-4, 1e-2, "log")}, batch=4,
                 save_dir=str(tmp_path / "tune"))
    assert math.isfinite(out["best_fitness"])
    assert (tmp_path / "tune" / "tune_results.csv").exists()
    assert (tmp_path / "tune" / "trial_1").is_dir()


def _tiny_track_dataset(root):
    from PIL import Image
    (root / "images/seq01").mkdir(parents=True)
    (root / "labels/seq01").mkdir(parents=True)
    paths = []
    for t in range(4):
        img = np.full((96, 96, 3), 70, np.uint8)
        cx, cy = 24 + 3 * t, 30
        img[cy - 7:cy + 7, cx - 7:cx + 7, 0] = 255
        Image.fromarray(img).save(root / f"images/seq01/{t:06d}.jpg")
        (root / f"labels/seq01/{t:06d}.txt").write_text(
            f"0 {cx/96:.4f} {cy/96:.4f} {14/96:.4f} {14/96:.4f} 1\n")
        paths.append(f"images/seq01/{t:06d}.jpg")
    (root / "train.txt").write_text("\n".join(paths))
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: train.txt\nval: train.txt\nnc: 1\n"
        "names:\n  0: a\n")
    return root / "data.yaml"


@pytest.mark.slow
def test_model_tune_end_to_end(tmp_path):
    """MOTRTrack.tune on a tiny on-disk dataset: 2 random trials x 1
    epoch, per-trial dirs + artifacts, finite best fitness."""
    from mo_yolo_tpu.api import MOTRTrack

    data = _tiny_track_dataset(tmp_path)
    m = MOTRTrack("tests/tiny_track.yaml", imgsz=96, dtype="float32",
                  nq=12, ndl=2, d_ffn=64, hd=32, num_denoising=8)
    out = m.tune(str(data), epochs=1, max_samples=2, seed=0,
                 save_dir=str(tmp_path / "tune"),
                 space={"lr": (1e-4, 1e-3, "log"), "lrf": (0.5, 1.0)},
                 batch=1, clip_len=2, max_gt=4)
    assert math.isfinite(out["best_fitness"])
    assert (tmp_path / "tune" / "best_hyperparameters.yaml").exists()
    assert (tmp_path / "tune" / "trial_0").is_dir()
    assert (tmp_path / "tune" / "trial_1").is_dir()
    # the original facade's weights were never touched by the trials
    assert m.cfg_path.endswith("tiny_track.yaml")
