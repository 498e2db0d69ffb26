"""Host training driver: epochs over clip batches, checkpoints, logging.

Equivalent of the reference `TrackTrainer`
(`models/MOTRtrack/train.py:144-434`): clip dataloader (5 consecutive
frames per video), per-clip optimizer step with loss normalized by clip
object count, EMA, LR warmup+cosine, periodic validation and best/last
checkpoints, early stopping.

TPU-first: the entire clip step (scan over frames, grads, optimizer, EMA)
is ONE jitted+sharded function (`mo_yolo_tpu.train.train_step`); this file
is only data feeding, logging and checkpoint IO. DP scale-out needs no
subprocess respawn (`utils/dist.py` in the reference) — the same script
drives any mesh size.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict

import numpy as np

from mo_yolo_tpu.utils.logging import LOGGER
from mo_yolo_tpu.utils.callbacks import default_callbacks


class EarlyStopping:
    """Patience-based stop on best fitness (reference
    `torch_utils.py:522`)."""

    def __init__(self, patience: int = 50):
        self.patience = patience
        self.best = -float("inf")
        self.best_epoch = 0

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness > self.best:
            self.best = fitness
            self.best_epoch = epoch
        return (epoch - self.best_epoch) >= self.patience


class TrackTrainer:
    def __init__(self, api_model, data: str, epochs: int = 1, batch: int = 1,
                 clip_len=5, lr: float = 1e-4, max_gt: int = 64,
                 save_dir: str = "runs/track", seed: int = 0,
                 val_every: int = -1, log_every: int = 10,
                 patience: int = 50, callbacks=None,
                 resume: bool = False, accumulate: int = 1,
                 augment: bool = False, hyp=None, clip_stages=None,
                 cache: bool = True, single_cls: bool = False,
                 plots: bool = True, lrf: float = 0.01,
                 save_period: int = -1, optimizer: str = "adamw",
                 momentum: float = 0.937, cos_lr: bool = True,
                 warmup_momentum: float = 0.8, warmup_bias_lr: float = 0.0,
                 nbs: int = -1, fraction: float = 1.0,
                 warmup_epochs: float = -1.0, val: bool = True,
                 pretrained=None, amp: bool = True):
        self.api = api_model
        self.data = data
        self.epochs = epochs
        self.batch = batch
        # progressive clip length (MOTR `sampler_lengths`/`sampler_steps`,
        # `MOTR/main.py:172-173`): clip_len may be a list, advancing at the
        # epochs in clip_stages. Each stage is its own compiled scan length;
        # params/EMA/optimizer state carry across stages unchanged (none of
        # them depend on T).
        if isinstance(clip_len, (list, tuple)):
            self.clip_lens = [int(t) for t in clip_len]
            self.clip_stages = [int(e) for e in (clip_stages or [])]
            if len(self.clip_stages) != len(self.clip_lens) - 1:
                raise ValueError(
                    f"clip_stages needs {len(self.clip_lens) - 1} epoch "
                    f"thresholds for clip_len={self.clip_lens}")
        else:
            self.clip_lens = [int(clip_len)]
            self.clip_stages = []
        self.clip_len = self.clip_lens[0]
        self.lr = lr
        self.max_gt = max_gt
        self.save_dir = Path(save_dir)
        self.seed = seed
        # -1 = auto: validate every epoch when the dataset has a val split
        # (the reference's default — BaseTrainer validates each epoch and
        # selects `best` by val fitness, `engine/trainer.py:386-400`);
        # 0 = off, N = every N epochs. Resolved in run() once `data` loads.
        self.val_every = val_every
        self.log_every = log_every
        self.stopper = EarlyStopping(patience)
        self.callbacks = callbacks or default_callbacks(save_dir)
        self.resume = resume
        # reference: accumulate = max(round(nbs / batch_size), 1)
        # (`models/MOTRtrack/train.py:238`); here it's explicit config
        self.accumulate = max(int(accumulate), 1)
        self.augment = augment
        self.hyp = hyp
        self.cache = cache              # RAM image cache (reference `cache`)
        self.single_cls = single_cls    # train all labels as class 0
        self.plots = plots              # results.png at train end
        self.lrf = lrf                  # final LR fraction
        self.save_period = save_period  # epoch-numbered saves every N
        self.optimizer = optimizer      # sgd|adam*|rmsprop|auto
        self.momentum = momentum
        self.cos_lr = cos_lr
        self.warmup_momentum = warmup_momentum
        self.warmup_bias_lr = warmup_bias_lr
        self.nbs = nbs                  # nominal batch: accumulate =
                                        # round(nbs/batch) once batch known
        if self.nbs and self.nbs > 0 and self.batch > 0:
            self.accumulate = max(round(self.nbs / self.batch), 1)
        # reference `fraction`: train on the first fraction of the dataset
        self.fraction = min(max(float(fraction), 0.0), 1.0) or 1.0
        # reference `warmup_epochs` (default 3.0 there): epoch-denominated
        # LR warmup; <0 keeps the step-denominated default (500 steps)
        self.warmup_epochs = float(warmup_epochs)
        # reference `val` bool: False disables in-train validation even if
        # val_every is set
        if not val:
            self.val_every = 0
        # reference `pretrained`: checkpoint (params dir) loaded into the
        # model before training starts
        self.pretrained = pretrained if isinstance(pretrained, str) else None
        # reference `amp` (bf16 activations on TPU); consumed in run()
        self.amp = bool(amp)

    def run(self) -> Dict[str, float]:
        import jax
        import jax.numpy as jnp
        from mo_yolo_tpu.data.dataset import (
            TrackDataset, clip_loader, load_dataset_yaml)
        from mo_yolo_tpu.parallel.mesh import make_mesh, make_sharded_train_step
        from mo_yolo_tpu.train.losses import LossConfig
        from mo_yolo_tpu.train.train_step import TrainConfig
        from mo_yolo_tpu.utils.checkpoint import save_checkpoint, save_params

        self.callbacks.fire("on_train_start", trainer=self)
        d = load_dataset_yaml(self.data)
        if self.val_every < 0:      # auto: reference validates every epoch
            self.val_every = 1 if d.get("val") else 0
        if self.fraction < 1.0:
            keep = max(int(round(len(d["train"]) * self.fraction)), 1)
            LOGGER.info(f"fraction={self.fraction}: {keep}/"
                        f"{len(d['train'])} train frames")
            d["train"] = d["train"][:keep]
        augmenter = None
        if self.augment:
            from mo_yolo_tpu.data.augment import ClipAugmenter
            hyp = self.hyp or {}
            # geometry defaults follow the reference's track configs
            # (mosaic/perspective off for track; HSV+flip+mild affine on)
            augmenter = ClipAugmenter(
                hsv_h=float(hyp.get("hsv_h", 0.015)),
                hsv_s=float(hyp.get("hsv_s", 0.7)),
                hsv_v=float(hyp.get("hsv_v", 0.4)),
                fliplr_p=float(hyp.get("fliplr", 0.5)),
                flipud_p=float(hyp.get("flipud", 0.0)),
                degrees=float(hyp.get("degrees", 0.0)),
                translate=float(hyp.get("translate", 0.05)),
                scale=float(hyp.get("scale", 0.2)),
                shear=float(hyp.get("shear", 0.0)),
                perspective=float(hyp.get("perspective", 0.0)),
                seed=self.seed)
        model = self.api.model
        if self.amp and model.dtype == jnp.float32 and \
                jax.default_backend() not in ("cpu",):
            # mixed precision (reference trains AMP,
            # `models/MOTRtrack/train.py:223`): the TRAIN twin computes in
            # bf16 while params/optimizer/losses stay f32 — flax modules
            # cast at op sites (dtype=), the loss path and tracker state
            # already accumulate f32 (train_step.py), and the final
            # variables are identical pytrees usable by the f32 facade
            model = model.clone(dtype=jnp.bfloat16)
            LOGGER.info("amp: training with bf16 activations (f32 params)")
        lcfg = LossConfig(nc=model.spec.nc)
        if self.batch == -1:
            # autobatch (reference `check_train_batch_size`, batch=-1):
            # per-device stream count from XLA compile-time memory
            # analysis, scaled by device count
            per_dev = self._autobatch(model, lcfg)
            self.batch = per_dev * len(jax.devices())
            LOGGER.info(f"autobatch: {per_dev} streams/device x "
                        f"{len(jax.devices())} devices -> batch "
                        f"{self.batch}")
        if self.nbs and self.nbs > 0:
            # reference `_setup_train`: accumulate = max(round(nbs/batch), 1)
            self.accumulate = max(round(self.nbs / max(self.batch, 1)), 1)
            LOGGER.info(f"nbs={self.nbs}: accumulate={self.accumulate}")
        # the batch (stream) axis shards over the mesh, so the mesh size
        # must divide the batch — clamp to gcd(batch, n_devices) the way
        # the reference clamps DDP world size to available GPUs
        import math
        n_dev = math.gcd(self.batch, len(jax.devices()))
        mesh = make_mesh(jax.devices()[:n_dev])

        def stage_for(epoch: int) -> int:
            s = 0
            for thr in self.clip_stages:
                if epoch >= thr:
                    s += 1
            return s

        total_steps = None      # fixed across stages so the LR schedule
                                # (and optax state structure) is identical

        def build_stage(T: int):
            nonlocal total_steps
            ds = TrackDataset(d["train"], imgsz=self.api.imgsz,
                              max_gt=self.max_gt, clip_len=T,
                              augmenter=augmenter, verify=True,
                              cache_images=self.cache,
                              single_cls=self.single_cls)
            n_clips = len(ds.clips)
            if n_clips == 0:
                raise ValueError("no clips found — dataset too small for "
                                 f"clip_len={T}")
            steps_per_epoch = max(n_clips // self.batch, 1)
            if total_steps is None:
                # LR schedule advances per EMITTED optimizer step
                # (MultiSteps calls the inner update once per `accumulate`
                # mini-steps)
                total_steps = max(
                    self.epochs * steps_per_epoch // self.accumulate, 1)
            wu = {}
            if self.warmup_epochs >= 0:
                wu["warmup_steps"] = max(int(
                    self.warmup_epochs * steps_per_epoch
                    / self.accumulate), 1)
            tcfg = TrainConfig(clip_len=T, lr=self.lr, lrf=self.lrf,
                               accumulate=self.accumulate,
                               total_steps=total_steps,
                               optimizer=self.optimizer,
                               momentum=self.momentum, cos_lr=self.cos_lr,
                               warmup_momentum=self.warmup_momentum,
                               warmup_bias_lr=self.warmup_bias_lr, **wu)
            init_fn, step = make_sharded_train_step(model, lcfg, tcfg, mesh)
            return ds, steps_per_epoch, init_fn, step

        cur_stage = 0
        ds, steps_per_epoch, init_fn, step = build_stage(self.clip_lens[0])
        if self.pretrained:
            # reference `pretrained`: start from saved weights
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.api.variables = load_params(self.pretrained,
                                             target=self.api.variables)
            LOGGER.info(f"pretrained weights loaded from {self.pretrained}")
        ts = init_fn(self.api.variables)

        # ---- resume (reference `engine/trainer.py:621-671`) ----
        start_epoch = 0
        resumed_best_fitness = -float("inf")
        last_full = self.save_dir / "last_full"
        if self.resume and last_full.exists():
            import json
            from mo_yolo_tpu.train.train_step import TrainState
            from mo_yolo_tpu.utils.checkpoint import load_checkpoint
            ts = TrainState(**load_checkpoint(str(last_full), target=ts))
            cfg_json = Path(str(last_full.resolve()) + ".config.json")
            if cfg_json.exists():
                with open(cfg_json) as f:
                    saved = json.load(f)
                start_epoch = int(saved.get("epoch", -1)) + 1
                # restore best-checkpoint + patience state (reference
                # `engine/trainer.py:641-671`): without this the first
                # post-resume epoch always clobbers a better `best`
                resumed_best_fitness = float(
                    saved.get("best_fitness", -float("inf")))
                self.stopper.best = float(
                    saved.get("stopper_best", self.stopper.best))
                self.stopper.best_epoch = int(
                    saved.get("stopper_best_epoch", self.stopper.best_epoch))
            LOGGER.info(f"resumed from {last_full}: epoch {start_epoch}, "
                        f"step {int(ts.step)}")
            if start_epoch >= self.epochs:
                LOGGER.info("nothing to resume: training already finished")
                return {"final_loss": float("nan")}
        elif self.resume:
            LOGGER.warning(f"resume requested but {last_full} not found; "
                           "starting fresh")
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), start_epoch)

        LOGGER.info(f"training: {len(ds)} frames, {len(ds.clips)} clips, "
                    f"{steps_per_epoch} steps/epoch x {self.epochs} epochs, "
                    f"clip_len={self.clip_lens}, mesh={mesh.devices.shape}")
        self.save_dir.mkdir(parents=True, exist_ok=True)
        if self.plots:
            self._plot_labels(ds)
        csv_path = self.save_dir / "results.csv"
        csv_rows = ["epoch,step,loss,grad_norm,num_objects,sec_per_step"]
        best_fitness = resumed_best_fitness
        metrics: Dict[str, float] = {}

        for epoch in range(start_epoch, self.epochs):
            if stage_for(epoch) != cur_stage:
                cur_stage = stage_for(epoch)
                T = self.clip_lens[cur_stage]
                LOGGER.info(f"epoch {epoch}: clip_len -> {T} "
                            "(progressive sampler stage switch)")
                ds, steps_per_epoch, _, step = build_stage(T)
                self.clip_len = T
            self.callbacks.fire("on_train_epoch_start", trainer=self,
                                epoch=epoch)
            t_ep = time.time()
            loss_dev = []   # device scalars; ONE batched fetch at epoch end
            for i, clip in enumerate(clip_loader(ds, self.batch, shuffle=True,
                                                 seed=self.seed + epoch)):
                if self.plots and epoch == start_epoch and i < 3:
                    self._plot_train_batch(clip, i)
                key, k = jax.random.split(key)
                t0 = time.time()
                clip = {kk: np_to_jnp(v) for kk, v in clip.items()}
                ts, m = step(ts, clip, k)
                loss_dev.append(m["loss"])
                if i % self.log_every == 0:
                    loss = float(m["loss"])  # host sync for logging only
                    dt = time.time() - t0
                    LOGGER.info(f"epoch {epoch} step {i}/{steps_per_epoch} "
                                f"loss {loss:.4f} gnorm "
                                f"{float(m['grad_norm']):.2f} ({dt:.2f}s)")
                    csv_rows.append(f"{epoch},{i},{loss:.5f},"
                                    f"{float(m['grad_norm']):.4f},"
                                    f"{int(m['num_objects'])},{dt:.3f}")
                self.callbacks.fire("on_train_batch_end", trainer=self,
                                    step=i, metrics=m)
            # epoch end: adopt EMA weights for eval/save (reference uses EMA
            # for validation, `train.py:433`)
            self.api.variables = {"params": ts.ema_params,
                                  "batch_stats": ts.batch_stats}
            save_params(str(self.save_dir / "last"), self.api.variables)
            if self.save_period > 0 and (epoch + 1) % self.save_period == 0:
                # reference `save_period`: additional epoch-numbered saves
                save_params(str(self.save_dir / f"epoch{epoch}"),
                            self.api.variables)
            # fitness fallback = -mean loss over EVERY step of the epoch
            # (round-1 weak #9: the old sampled-loss proxy tracked only
            # every log_every-th step)
            import jax.numpy as jnp
            fitness = -float(jnp.stack(loss_dev).mean()) if loss_dev else 0.0
            if self.val_every and (epoch + 1) % self.val_every == 0 and d["val"]:
                metrics = self.api.val(d["val"][:200])
                fitness = metrics.get("HOTA", fitness)
                LOGGER.info(f"epoch {epoch} val: {metrics}")
            if fitness > best_fitness:
                best_fitness = fitness
                save_params(str(self.save_dir / "best"), self.api.variables)
            stop = self.stopper(epoch, fitness)
            # full-state save AFTER the fitness/stopper update so a resumed
            # run restores this epoch's best_fitness, not last epoch's
            save_checkpoint(str(self.save_dir / "last_full"), ts,
                            config={"epoch": epoch, "step": int(ts.step),
                                    "best_fitness": best_fitness,
                                    "stopper_best": self.stopper.best,
                                    "stopper_best_epoch":
                                        self.stopper.best_epoch})
            csv_path.write_text("\n".join(csv_rows) + "\n")
            self.callbacks.fire("on_train_epoch_end", trainer=self,
                                epoch=epoch, metrics=metrics)
            LOGGER.info(f"epoch {epoch} done in {time.time()-t_ep:.1f}s")
            if stop:
                LOGGER.info(f"early stopping at epoch {epoch} "
                            f"(best epoch {self.stopper.best_epoch})")
                break
        if self.plots:  # training curves (reference `plots` flag)
            try:
                from mo_yolo_tpu.utils.plotting import plot_results
                plot_results(str(csv_path))
            except Exception as e:  # never fail a run on plotting
                LOGGER.warning(f"plot_results failed: {e}")
        # final eval of the BEST checkpoint (reference
        # `BaseTrainer.final_eval`, `engine/trainer.py:602-616`): the
        # returned metrics describe `best`, and the live model keeps the
        # best weights — not whatever the last (possibly worse) epoch left
        best_dir = self.save_dir / "best"
        if self.val_every and d.get("val") and best_dir.exists():
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.api.variables = load_params(str(best_dir),
                                             target=self.api.variables)
            metrics = self.api.val(d["val"][:200])
            LOGGER.info(f"final eval (best): {metrics}")
        self.callbacks.fire("on_train_end", trainer=self, metrics=metrics)
        metrics["final_loss"] = -best_fitness if not metrics else \
            metrics.get("final_loss", -best_fitness)
        return metrics


    def _plot_labels(self, ds) -> None:
        """Label-statistics artifacts at train start (reference
        `plot_labels` -> labels.jpg + labels_correlogram.jpg, fired from
        `BaseTrainer._setup_train` when plots=True). Reads the cached
        6-col label rows directly — no image decode."""
        try:
            rows = [ds._label(i) for i in range(len(ds))]
            lab = np.concatenate([r for r in rows if len(r)], axis=0) \
                if any(len(r) for r in rows) else np.zeros((0, 6))
            if not len(lab):
                return
            from mo_yolo_tpu.utils.plotting import (plot_labels,
                                                    plot_labels_correlogram)
            plot_labels(lab[:, 0], lab[:, 1:5],
                        str(self.save_dir / "labels.jpg"))
            plot_labels_correlogram(
                lab[:, 1:5], str(self.save_dir / "labels_correlogram.jpg"))
        except Exception as e:  # plotting must never fail a run
            LOGGER.warning(f"label plots failed: {e}")

    def _plot_train_batch(self, clip, i: int) -> None:
        """train_batch{i}.jpg mosaic with boxes + track ids (reference
        `plot_training_samples` -> `plot_images`): first clip frames of
        the first epoch, exactly what the model will see."""
        try:
            from mo_yolo_tpu.utils.plotting import save_train_batch
            T, B = clip["images"].shape[:2]
            flat = lambda a: np.asarray(a).reshape((T * B,) + a.shape[2:])
            save_train_batch(flat(clip["images"]), flat(clip["gt_boxes"]),
                             str(self.save_dir / f"train_batch{i}.jpg"),
                             ids=flat(clip["gt_track_id"]),
                             mask=flat(clip["gt_mask"]))
        except Exception as e:
            LOGGER.warning(f"train-batch plot failed: {e}")

    def _autobatch(self, model, lcfg, candidates=(1, 2, 4, 8)) -> int:
        """Largest per-device stream count whose compiled train step fits
        in device memory (utils/autobatch.py semantics, applied to the
        full clip train step at real shapes)."""
        import jax
        import jax.numpy as jnp
        from mo_yolo_tpu.parallel.mesh import (make_mesh,
                                               make_sharded_train_step)
        from mo_yolo_tpu.train.train_step import TrainConfig
        from mo_yolo_tpu.utils.autobatch import device_memory_bytes

        T = self.clip_lens[0]
        mesh = make_mesh(jax.devices()[:1])
        init_fn, step = make_sharded_train_step(
            model, lcfg, TrainConfig(clip_len=T, lr=self.lr,
                                     total_steps=10), mesh)
        ts = init_fn(self.api.variables)
        from mo_yolo_tpu.data.letterbox import to_hw
        ih, iw = to_hw(self.api.imgsz)
        limit = device_memory_bytes()
        best = candidates[0]
        for b in candidates:
            clip = {
                "images": jnp.zeros((T, b, ih, iw, 3), jnp.float32),
                "gt_cls": jnp.zeros((T, b, self.max_gt), jnp.int32),
                "gt_boxes": jnp.zeros((T, b, self.max_gt, 4), jnp.float32),
                "gt_track_id": jnp.zeros((T, b, self.max_gt), jnp.int32),
                "gt_mask": jnp.ones((T, b, self.max_gt), bool),
            }
            try:
                mem = step.lower(ts, clip, jax.random.PRNGKey(0)) \
                    .compile().memory_analysis()
                need = (getattr(mem, "temp_size_in_bytes", 0) +
                        getattr(mem, "argument_size_in_bytes", 0) +
                        getattr(mem, "output_size_in_bytes", 0))
                if limit is not None and need > 0.9 * limit:
                    break
                best = b
            except Exception as e:
                LOGGER.warning(f"autobatch probe b={b} failed: {e}")
                break
        return best


def np_to_jnp(x):
    import jax.numpy as jnp
    return jnp.asarray(x)
