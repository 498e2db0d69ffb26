"""Hyperparameter tuning (reference `ultralytics/utils/tuner.py:6-120`
`run_ray_tune`, surfaced as `Model.tune`, `engine/model.py:396-408`).

The reference delegates entirely to Ray Tune: uniform search space,
`max_samples` random trials, an ASHA scheduler that stops trials after
`grace_period` epochs when they fall out of the top fraction. Ray does not
ship in this environment — and on a single-host TPU it is the wrong tool
anyway (one chip runs one trial at a time) — so the native implementation
is a sequential random-search + successive-halving loop with the same
knobs, the same default search space (filtered to keys these trainers
honor), and the same artifacts (per-trial dirs, a results CSV, the best
hyperparameters saved as yaml). When `ray[tune]` IS importable,
`run_ray_tune` delegates to it like the reference does.
"""
from __future__ import annotations

import csv
import json
import math
import random
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

from mo_yolo_tpu.utils.logging import LOGGER

# Search space: key -> (low, high) uniform, (low, high, "log") log-uniform,
# or a list/tuple of categorical choices. Mirrors the reference default
# space (`utils/tuner.py:47-66`; `lr0` is our `lr`), restricted to keys the
# trainers actually honor.
DEFAULT_SPACE: Dict[str, Any] = {
    "lr": (1e-5, 1e-1, "log"),
    "lrf": (0.01, 1.0),             # final LR fraction
    "momentum": (0.6, 0.98),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}

# Fitness extracted from a trainer's returned metrics dict, first hit wins
# (reference uses TASK2METRIC, e.g. metrics/mAP50-95 — `tuner.py:99`).
FITNESS_KEYS = ("fitness", "HOTA", "mAP50-95", "mAP50", "top1", "accuracy")


def sample_hyp(space: Dict[str, Any], rng: random.Random) -> Dict[str, Any]:
    """Draw one hyperparameter set from the space."""
    out: Dict[str, Any] = {}
    for k, spec in space.items():
        if isinstance(spec, (list, set)) or (
                isinstance(spec, tuple) and spec and
                isinstance(spec[0], str)):
            out[k] = rng.choice(sorted(spec) if isinstance(spec, set)
                                else list(spec))
        elif isinstance(spec, tuple) and len(spec) == 3 and spec[2] == "log":
            lo, hi = math.log(spec[0]), math.log(spec[1])
            out[k] = math.exp(rng.uniform(lo, hi))
        elif isinstance(spec, tuple) and len(spec) == 2:
            out[k] = rng.uniform(float(spec[0]), float(spec[1]))
        else:
            out[k] = spec           # fixed value
    return out


def fitness_of(metrics: Dict[str, Any]) -> float:
    """Scalar fitness from a trainer metrics dict (higher is better)."""
    for k in FITNESS_KEYS:
        v = metrics.get(k)
        if v is not None and math.isfinite(float(v)):
            return float(v)
    for k in ("final_loss", "loss"):
        v = metrics.get(k)
        if v is not None and math.isfinite(float(v)):
            return -float(v)
    return -float("inf")


class Tuner:
    """Random search + successive halving over a user-supplied train_fn.

    train_fn(hyp, epochs, save_dir, resume) -> metrics dict. `resume=True`
    asks the trial to continue from its own save_dir (TrackTrainer
    supports this natively; trainers without resume may retrain from
    scratch at the longer budget — still a correct halving bracket, just
    costlier).

    ASHA-style rungs (reference grace_period, `utils/tuner.py:8,97`):
    every trial runs `grace_period` epochs; the top 1/`reduction` fraction
    advances to `grace_period*reduction` epochs, and so on until `epochs`.
    grace_period=0 (or >= epochs) disables halving: every trial runs the
    full budget.
    """

    def __init__(self, train_fn: Callable[..., Dict[str, Any]],
                 space: Optional[Dict[str, Any]] = None,
                 max_samples: int = 10, grace_period: int = 0,
                 reduction: int = 2, seed: int = 0,
                 save_dir: str = "runs/tune"):
        if int(max_samples) < 1:
            raise ValueError(f"max_samples must be >= 1, got {max_samples}")
        self.train_fn = train_fn
        self.space = dict(space or DEFAULT_SPACE)
        self.max_samples = int(max_samples)
        self.grace_period = int(grace_period)
        self.reduction = max(int(reduction), 2)
        self.rng = random.Random(seed)
        self.save_dir = Path(save_dir)

    def _rungs(self, epochs: int) -> List[int]:
        if self.grace_period <= 0 or self.grace_period >= epochs:
            return [epochs]
        rungs, e = [], self.grace_period
        while e < epochs:
            rungs.append(e)
            e *= self.reduction
        return rungs + [epochs]

    def __call__(self, epochs: int = 10) -> Dict[str, Any]:
        self.save_dir.mkdir(parents=True, exist_ok=True)
        trials = [{"trial": i, "hyp": sample_hyp(self.space, self.rng),
                   "fitness": -float("inf"), "epochs_run": 0,
                   "metrics": {}, "stopped": False}
                  for i in range(self.max_samples)]
        rungs = self._rungs(int(epochs))
        alive = list(trials)
        first_err: Optional[Exception] = None
        any_ok = False
        for r, budget in enumerate(rungs):
            for t in alive:
                tdir = self.save_dir / f"trial_{t['trial']}"
                LOGGER.info("tune: trial %d rung %d -> %d epochs %s",
                            t["trial"], r, budget, t["hyp"])
                try:
                    m = self.train_fn(dict(t["hyp"]), budget, str(tdir),
                                      t["epochs_run"] > 0)
                    any_ok = True
                except Exception as e:          # a diverged trial is a
                    LOGGER.warning("tune: trial %d failed: %s",
                                   t["trial"], e)
                    first_err = first_err or e
                    if t["epochs_run"] > 0:
                        # a transient failure at a LATER rung must not
                        # erase the fitness the trial already earned —
                        # keep the prior result, just stop advancing it
                        t["stopped"] = True
                        continue
                    m = {}                      # worst-fitness data point
                t["metrics"] = m
                t["fitness"] = fitness_of(m)
                t["epochs_run"] = budget
            alive = [t for t in alive if not t["stopped"]]
            if not any_ok:
                # EVERY first-rung trial failed: that's a configuration
                # error, not divergence — surface the real exception
                raise RuntimeError(
                    f"tune: all {len(alive)} trials failed; first error: "
                    f"{first_err}") from first_err
            if not alive:
                break               # every survivor failed mid-bracket
            alive.sort(key=lambda t: t["fitness"], reverse=True)
            if budget < rungs[-1]:
                keep = max(len(alive) // self.reduction, 1)
                for t in alive[keep:]:
                    t["stopped"] = True
                alive = alive[:keep]
        trials.sort(key=lambda t: t["fitness"], reverse=True)
        best = trials[0]
        self._write_artifacts(trials, best)
        return {"best_hyp": best["hyp"], "best_fitness": best["fitness"],
                "best_trial": best["trial"],
                "best_save_dir": str(self.save_dir /
                                     f"trial_{best['trial']}"),
                "results": trials}

    def _write_artifacts(self, trials, best):
        keys = sorted(self.space)
        with open(self.save_dir / "tune_results.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["trial", "fitness", "epochs_run", "stopped"] + keys)
            for t in trials:
                w.writerow([t["trial"], t["fitness"], t["epochs_run"],
                            t["stopped"]] +
                           [t["hyp"].get(k, "") for k in keys])
        # best hyperparameters as yaml (reference writes these into the
        # ray results dir; we keep the ultralytics-style artifact name)
        lines = [f"# best fitness {best['fitness']:.6g} "
                 f"(trial {best['trial']})"]
        for k in keys:
            if k in best["hyp"]:
                lines.append(f"{k}: {best['hyp'][k]}")
        (self.save_dir / "best_hyperparameters.yaml").write_text(
            "\n".join(lines) + "\n")
        with open(self.save_dir / "tune_results.json", "w") as f:
            json.dump([{k: v for k, v in t.items() if k != "metrics"}
                       for t in trials], f, indent=1)
        try:     # fitness-vs-dimension scatter grid (best-effort)
            from mo_yolo_tpu.utils.plotting import plot_tune_results
            plot_tune_results(trials,
                              str(self.save_dir / "tune_scatter_plots.png"))
        except Exception as e:
            LOGGER.warning(f"tune plot skipped: {e}")


def run_ray_tune(model, space: Optional[dict] = None,
                 grace_period: int = 10, gpu_per_trial=None,
                 max_samples: int = 10, reduction: int = 2, seed: int = 0,
                 save_dir: Optional[str] = None, **train_args):
    """Reference-shaped entrypoint (`utils/tuner.py:6-14`): delegate to Ray
    Tune when installed, else run the native Tuner through `model.tune`.
    reduction/seed/save_dir carry the caller's tune settings through both
    paths (the fallback must not silently revert them to defaults)."""
    try:
        from ray import tune  # noqa: F401
        from ray.tune.schedulers import ASHAScheduler  # noqa: F401
    except ImportError:
        LOGGER.info("ray[tune] not installed; using the native tuner")
        return model.tune(space=space, grace_period=grace_period,
                          max_samples=max_samples, reduction=reduction,
                          seed=seed, save_dir=save_dir, **train_args)
    # Ray path (untestable in this offline image, mirrors the reference):
    from ray import tune
    from ray.tune.schedulers import ASHAScheduler

    data = train_args.pop("data")
    epochs = int(train_args.pop("epochs", 10))

    def _report(payload: dict):
        try:                      # ray>=2: function trainables report via
            from ray.air import session  # the session API
            session.report(payload)
        except ImportError:       # legacy ray 1.x
            tune.report(**payload)

    def _trainable(config):
        m = model._fresh_for_tune(seed=seed)
        metrics = m.train(data=data, epochs=epochs,
                          **model._route_tune_hyp(config), **train_args)
        _report({"fitness": fitness_of(metrics)})

    def _dim(v):
        if isinstance(v, tuple) and len(v) == 3 and v[2] == "log":
            return tune.loguniform(v[0], v[1])
        if isinstance(v, tuple) and len(v) == 2:
            return tune.uniform(v[0], v[1])
        if isinstance(v, (list, set)):
            return tune.choice(sorted(v) if isinstance(v, set) else list(v))
        return v                  # fixed value

    sp = {k: _dim(v) for k, v in (space or DEFAULT_SPACE).items()}
    kw = {}
    if save_dir:
        try:                       # honor the caller's artifact dir
            from ray.air import RunConfig
            kw["run_config"] = RunConfig(
                storage_path=str(Path(save_dir).resolve()))
        except ImportError:
            pass
    tuner = tune.Tuner(
        _trainable, param_space=sp,
        tune_config=tune.TuneConfig(
            scheduler=ASHAScheduler(metric="fitness", mode="max",
                                    grace_period=grace_period,
                                    reduction_factor=max(int(reduction), 2)),
            num_samples=max_samples), **kw)
    return tuner.fit()
