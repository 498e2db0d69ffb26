"""Segment / Pose / Classify host trainers.

Thin drivers in the DetectTrainer mold (reference
`models/yolo/{segment,pose,classify}/train.py`): epochs over shuffled
image batches, one jitted step (loss from `train.v8_loss`), ramped EMA,
per-epoch orbax checkpoints. Labels follow the reference txt formats
(`data/seg_pose_labels.py`); masks are rasterized once at proto
resolution and cached.
"""

from __future__ import annotations

import random
import time
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mo_yolo_tpu.train.train_step import (TrainConfig, TrainState,
                                          make_optimizer)
from mo_yolo_tpu.train.v8_loss import (V8LossConfig, classification_loss,
                                       v8_pose_loss, v8_segmentation_loss)
from mo_yolo_tpu.utils.logging import LOGGER


# --------------------------------------------------------------------- #
# datasets
# --------------------------------------------------------------------- #
class SegDataset:
    """Images + polygon labels -> fixed-shape (image, cls, boxes xyxy px,
    pad mask, masks at proto resolution)."""

    def __init__(self, files, imgsz: int, max_gt: int = 16,
                 mask_ratio: int = 4, overlap_mask: bool = True):
        self.files = list(files)
        self.imgsz = imgsz
        # reference `mask_ratio`: GT masks rasterized at imgsz/mask_ratio
        # (loss resizes to proto res when they differ)
        self.proto = imgsz // int(mask_ratio)
        # reference `overlap_mask`: overlapping pixels resolved to one
        # owner (big instances drawn first, small last wins) instead of
        # independent per-instance maps
        self.overlap_mask = overlap_mask
        self.max_gt = max_gt

    def __len__(self):
        return len(self.files)

    def load(self, i: int):
        from mo_yolo_tpu.data.dataset import img2label_path
        from mo_yolo_tpu.data.letterbox import preprocess
        from mo_yolo_tpu.data.loaders import load_image
        from mo_yolo_tpu.data.seg_pose_labels import (
            parse_seg_label, polygons_to_boxes, rasterize_polygons)

        img = load_image(self.files[i])
        x, _ = preprocess(img, self.imgsz, scale_fill=True)
        cls, polys = parse_seg_label(img2label_path(self.files[i]))
        G = self.max_gt
        n = min(len(cls), G)
        out_cls = np.zeros(G, np.int32)
        out_box = np.zeros((G, 4), np.float32)
        out_m = np.zeros(G, bool)
        out_masks = np.zeros((G, self.proto, self.proto), np.float32)
        if n:
            out_cls[:n] = cls[:n]
            out_box[:n] = polygons_to_boxes(polys[:n]) * self.imgsz
            out_m[:n] = True
            out_masks[:n] = rasterize_polygons(polys[:n], self.proto)
            if self.overlap_mask and n > 1:
                areas = out_masks[:n].sum((1, 2))
                owner = np.full((self.proto, self.proto), -1, np.int32)
                for j in np.argsort(-areas):      # descending area;
                    owner[out_masks[j] > 0.5] = j  # smallest wins overlap
                for j in range(n):
                    out_masks[j] = (owner == j).astype(np.float32)
        return x[0], out_cls, out_box, out_m, out_masks


class PoseDataset:
    """Images + keypoint labels -> fixed-shape (image, cls, boxes xyxy px,
    pad mask, kpts px [G,K,3])."""

    def __init__(self, files, imgsz: int, n_kpt: int, max_gt: int = 16):
        self.files = list(files)
        self.imgsz = imgsz
        self.n_kpt = n_kpt
        self.max_gt = max_gt

    def __len__(self):
        return len(self.files)

    def load(self, i: int):
        from mo_yolo_tpu.data.dataset import img2label_path
        from mo_yolo_tpu.data.letterbox import preprocess
        from mo_yolo_tpu.data.loaders import load_image
        from mo_yolo_tpu.data.seg_pose_labels import parse_pose_label

        img = load_image(self.files[i])
        x, _ = preprocess(img, self.imgsz, scale_fill=True)
        cls, boxes, kpts = parse_pose_label(
            img2label_path(self.files[i]), self.n_kpt)
        s = self.imgsz
        G = self.max_gt
        n = min(len(cls), G)
        out_cls = np.zeros(G, np.int32)
        out_box = np.zeros((G, 4), np.float32)
        out_m = np.zeros(G, bool)
        out_k = np.zeros((G, self.n_kpt, 3), np.float32)
        if n:
            out_cls[:n] = cls[:n]
            cx, cy, w, h = (boxes[:n] * s).T
            out_box[:n] = np.stack([cx - w / 2, cy - h / 2,
                                    cx + w / 2, cy + h / 2], 1)
            out_m[:n] = True
            out_k[:n] = kpts[:n]
            out_k[:n, :, :2] *= s
        return x[0], out_cls, out_box, out_m, out_k


# --------------------------------------------------------------------- #
# trainers
# --------------------------------------------------------------------- #
class _TaskTrainer:
    """Shared epoch loop; subclasses provide dataset + loss closure."""

    task = "task"

    def __init__(self, model, variables, data: str, epochs: int = 1,
                 batch: int = 4, lr: float = 1e-4, max_gt: int = 16,
                 imgsz: int = 256, save_dir: str = "", seed: int = 0,
                 log_every: int = 10, hyp=None, fraction: float = 1.0,
                 pretrained=None, val_every: int = -1, val: bool = True,
                 patience: int = 50, callbacks=None):
        from mo_yolo_tpu.utils.callbacks import default_callbacks
        # reference BaseTrainer event bus — every task trainer fires the
        # same train-lifecycle events (engine/trainer.py:167 run_callbacks)
        self.callbacks = callbacks or default_callbacks(
            save_dir or f"runs/{self.task}")
        self.model = model
        self.variables = variables
        # -1 = auto: validate every epoch when the dataset has a val split
        # (the reference's default); 0 = off; N = every N epochs
        self.val_every = val_every if val else 0
        self.patience = patience
        # reference `fraction` / `pretrained` (same semantics as the
        # track/detect trainers)
        self.fraction = min(max(float(fraction), 0.0), 1.0) or 1.0
        if isinstance(pretrained, str) and pretrained:
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.variables = load_params(pretrained, target=self.variables)
            LOGGER.info(f"pretrained weights loaded from {pretrained}")
        self.data = data
        self.epochs = epochs
        self.batch = batch
        self.lr = lr
        self.max_gt = max_gt
        self.imgsz = imgsz
        self.save_dir = Path(save_dir or f"runs/{self.task}")
        self.seed = seed
        self.log_every = log_every
        self.hyp = dict(hyp or {})      # box/cls/dfl/pose/kobj loss gains

    def _loss_cfg(self) -> "V8LossConfig":
        """Reference hyp surface: `box`/`cls`/`dfl` loss gains
        (`cfg/default.yaml:96-98`) are honored via `hyp`."""
        return V8LossConfig(nc=self.model.spec.nc,
                            gain_box=float(self.hyp.get("box", 7.5)),
                            gain_cls=float(self.hyp.get("cls", 0.5)),
                            gain_dfl=float(self.hyp.get("dfl", 1.5)))

    # subclass API ------------------------------------------------------ #
    def make_dataset(self, files):
        raise NotImplementedError

    def loss_fn(self, params, batch_stats, batch):
        raise NotImplementedError

    def batch_from(self, samples) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def validate(self, files) -> Dict[str, float]:
        """Task validator pass over the val split (subclass hook)."""
        raise NotImplementedError

    @staticmethod
    def fitness_of(metrics: Dict[str, float]) -> float:
        """Reference fitness: 0.1*mAP50 + 0.9*mAP50-95, summed over the
        task's metric suffixes ((B)+(M) for segment, (B)+(P) for pose,
        `utils/metrics.py fitness`)."""
        f = 0.0
        for k, v in metrics.items():
            if k.startswith("mAP50-95"):
                f += 0.9 * v
            elif k.startswith("mAP50"):
                f += 0.1 * v
        return f

    # ------------------------------------------------------------------ #
    def run(self) -> Dict[str, float]:
        from mo_yolo_tpu.data.dataset import load_dataset_yaml
        from mo_yolo_tpu.utils.checkpoint import save_params

        self.callbacks.fire("on_train_start", trainer=self)
        d = load_dataset_yaml(self.data)
        if self.val_every < 0:      # auto: reference validates every epoch
            self.val_every = 1 if d.get("val") else 0
        if self.fraction < 1.0:
            keep = max(int(round(len(d["train"]) * self.fraction)), 1)
            d["train"] = d["train"][:keep]
        ds = self.make_dataset(d["train"])
        steps = max(len(ds) // self.batch, 1)
        tcfg = TrainConfig(clip_len=1, lr=self.lr,
                           total_steps=max(self.epochs * steps, 1))
        tx = make_optimizer(tcfg)
        params = self.variables["params"]
        ts = TrainState(params=params,
                        batch_stats=self.variables.get("batch_stats", {}),
                        opt_state=tx.init(params),
                        ema_params=jax.tree.map(lambda x: x.copy(), params),
                        step=jnp.zeros((), jnp.int32))

        @jax.jit
        def step_fn(ts, batch):
            (loss, (bstats, metrics)), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(ts.params, ts.batch_stats,
                                            batch)
            updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
            params = optax.apply_updates(ts.params, updates)
            dd = tcfg.ema_decay * (1.0 - jnp.exp(
                -(ts.step.astype(jnp.float32) + 1.0) / 2000.0))
            ema = jax.tree.map(lambda e, p: e * dd + p * (1 - dd),
                               ts.ema_params, params)
            metrics["loss"] = loss
            return TrainState(params, bstats, opt_state, ema,
                              ts.step + 1), metrics

        self.save_dir.mkdir(parents=True, exist_ok=True)
        losses = []
        from mo_yolo_tpu.train.trainer import EarlyStopping
        stopper = EarlyStopping(self.patience)
        best_fitness = -float("inf")
        metrics: Dict[str, float] = {}
        for epoch in range(self.epochs):
            order = list(range(len(ds)))
            random.Random(self.seed + epoch).shuffle(order)
            t0 = time.time()
            ep_loss_dev = []
            for i in range(steps):
                idx = order[i * self.batch:(i + 1) * self.batch]
                if len(idx) < self.batch:
                    break
                ts, m = step_fn(ts, self.batch_from(
                    [ds.load(j) for j in idx]))
                ep_loss_dev.append(m["loss"])   # device scalar, no sync
                self.callbacks.fire("on_train_batch_end", trainer=self,
                                    step=i, metrics=m)
                if i % self.log_every == 0:
                    loss = float(m["loss"])
                    losses.append(loss)
                    LOGGER.info(f"{self.task} epoch {epoch} step {i}/{steps} "
                                f"loss {loss:.4f}")
            self.variables = {"params": ts.ema_params,
                              "batch_stats": ts.batch_stats}
            save_params(str(self.save_dir / "last"), self.variables)
            fitness = -float(jnp.stack(ep_loss_dev).mean()) \
                if ep_loss_dev else 0.0
            if self.val_every and (epoch + 1) % self.val_every == 0 \
                    and d.get("val"):
                metrics = self.validate(d["val"])
                fitness = self.fitness_of(metrics)
                LOGGER.info(f"{self.task} epoch {epoch} val: {metrics}")
            if fitness > best_fitness:
                best_fitness = fitness
                save_params(str(self.save_dir / "best"), self.variables)
            self.callbacks.fire("on_train_epoch_end", trainer=self,
                                epoch=epoch, metrics=metrics)
            LOGGER.info(f"{self.task} epoch {epoch} done in "
                        f"{time.time()-t0:.1f}s")
            if stopper(epoch, fitness):
                LOGGER.info(f"{self.task} early stopping at epoch {epoch}")
                break
        # final eval of BEST (reference `BaseTrainer.final_eval`)
        best_dir = self.save_dir / "best"
        if self.val_every and d.get("val") and best_dir.exists():
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.variables = load_params(str(best_dir),
                                         target=self.variables)
            metrics = self.validate(d["val"])
            LOGGER.info(f"{self.task} final eval (best): {metrics}")
        out = dict(metrics)
        out["final_loss"] = losses[-1] if losses else float("nan")
        self.callbacks.fire("on_train_end", trainer=self, metrics=out)
        return out


class SegTrainer(_TaskTrainer):
    task = "segment"

    def __init__(self, *a, mask_ratio: int = 4, overlap_mask: bool = True,
                 **kw):
        super().__init__(*a, **kw)
        self.mask_ratio = int(mask_ratio)
        self.overlap_mask = bool(overlap_mask)

    def make_dataset(self, files):
        return SegDataset(files, self.imgsz, self.max_gt,
                          mask_ratio=self.mask_ratio,
                          overlap_mask=self.overlap_mask)

    def validate(self, files):
        from mo_yolo_tpu.engine.validator import SegmentationValidator
        return SegmentationValidator(self.model, self.variables,
                                     imgsz=self.imgsz)(files)

    def batch_from(self, samples):
        img, cls, box, m, masks = (np.stack(z) for z in zip(*samples))
        return {"images": jnp.asarray(img), "gt_cls": jnp.asarray(cls),
                "gt_boxes": jnp.asarray(box), "gt_mask": jnp.asarray(m),
                "gt_masks": jnp.asarray(masks)}

    def loss_fn(self, params, batch_stats, batch):
        cfg = self._loss_cfg()
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], True, True, mutable=["batch_stats"])
        box_dist, cls_logits, anc, strides, coef, protos = out
        gtm = batch["gt_masks"]
        if gtm.shape[-2:] != protos.shape[1:3]:
            # mask_ratio != 4: bring GT masks to proto resolution
            gtm = jax.image.resize(
                gtm, (*gtm.shape[:2], *protos.shape[1:3]), "nearest")
        losses = v8_segmentation_loss(
            cfg, box_dist, cls_logits, anc, strides, coef, protos,
            batch["gt_cls"], batch["gt_boxes"], batch["gt_mask"],
            gtm, imgsz=float(self.imgsz))
        return losses["loss"], (mut["batch_stats"],
                                {k: v for k, v in losses.items()
                                 if k != "loss"})


class PoseTrainer(_TaskTrainer):
    task = "pose"

    def make_dataset(self, files):
        return PoseDataset(files, self.imgsz, self.model.kpt_shape[0],
                           self.max_gt)

    def validate(self, files):
        from mo_yolo_tpu.engine.validator import PoseValidator
        return PoseValidator(self.model, self.variables,
                             imgsz=self.imgsz)(files)

    def batch_from(self, samples):
        img, cls, box, m, kpts = (np.stack(z) for z in zip(*samples))
        return {"images": jnp.asarray(img), "gt_cls": jnp.asarray(cls),
                "gt_boxes": jnp.asarray(box), "gt_mask": jnp.asarray(m),
                "gt_kpts": jnp.asarray(kpts)}

    def loss_fn(self, params, batch_stats, batch):
        cfg = self._loss_cfg()
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], True, True, mutable=["batch_stats"])
        box_dist, cls_logits, anc, strides, kpts = out
        losses = v8_pose_loss(
            cfg, box_dist, cls_logits, anc, strides, kpts,
            batch["gt_cls"], batch["gt_boxes"], batch["gt_mask"],
            batch["gt_kpts"],
            gain_pose=float(self.hyp.get("pose", 12.0)),
            gain_kobj=float(self.hyp.get("kobj", 1.0)))
        return losses["loss"], (mut["batch_stats"],
                                {k: v for k, v in losses.items()
                                 if k != "loss"})


class ClassifyTrainer(_TaskTrainer):
    """Image classification over a directory-per-class tree (reference
    `models/yolo/classify/train.py`)."""

    task = "classify"

    def __init__(self, model, variables, data: str, names=None, **kw):
        super().__init__(model, variables, data, **kw)
        self.names = names

    def run(self):
        # classification datasets are class-subdir trees, not yamls.
        # Reference layout (`models/yolo/classify/train.py`): an optional
        # train/ + test|val/ split pair of subtrees; a bare class-dir tree
        # trains on everything with no val split.
        import glob
        import os

        self.callbacks.fire("on_train_start", trainer=self)
        root = Path(self.data)
        train_root, val_root = root, None
        if (root / "train").is_dir():
            train_root = root / "train"
            for s in ("test", "val"):       # reference prefers test
                if (root / s).is_dir():
                    val_root = root / s
                    break
        if self.val_every < 0:
            self.val_every = 1 if val_root is not None else 0
        classes = sorted(p.name for p in train_root.iterdir()
                         if p.is_dir())
        files, labels = [], []
        for ci, c in enumerate(classes):
            for f in glob.glob(str(train_root / c / "*")):
                files.append(f)
                labels.append(ci)
        if not files:
            raise ValueError(f"no class-subdir images under {root}")
        if self.fraction < 1.0:
            keep = max(int(round(len(files) * self.fraction)), 1)
            files, labels = files[:keep], labels[:keep]
        self._files, self._labels = files, np.asarray(labels, np.int32)
        self.data_is_tree = True

        tcfg = TrainConfig(clip_len=1, lr=self.lr,
                           total_steps=max(
                               self.epochs * len(files) // self.batch, 1))
        tx = make_optimizer(tcfg)
        params = self.variables["params"]
        ts = TrainState(params=params,
                        batch_stats=self.variables.get("batch_stats", {}),
                        opt_state=tx.init(params),
                        ema_params=jax.tree.map(lambda x: x.copy(), params),
                        step=jnp.zeros((), jnp.int32))

        @jax.jit
        def step_fn(ts, images, labels, key):
            def lf(p, bs):
                logits, mut = self.model.apply(
                    {"params": p, "batch_stats": bs}, images, True,
                    mutable=["batch_stats"], rngs={"dropout": key})
                ls = float(self.hyp.get("label_smoothing", 0.0))
                return classification_loss(logits, labels,
                                           label_smoothing=ls), \
                    mut["batch_stats"]

            (loss, bstats), grads = jax.value_and_grad(
                lf, has_aux=True)(ts.params, ts.batch_stats)
            updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
            params = optax.apply_updates(ts.params, updates)
            dd = tcfg.ema_decay * (1.0 - jnp.exp(
                -(ts.step.astype(jnp.float32) + 1.0) / 2000.0))
            ema = jax.tree.map(lambda e, p: e * dd + p * (1 - dd),
                               ts.ema_params, params)
            return TrainState(params, bstats, opt_state, ema,
                              ts.step + 1), loss

        from mo_yolo_tpu.data.letterbox import preprocess
        from mo_yolo_tpu.data.loaders import load_image
        from mo_yolo_tpu.utils.checkpoint import save_params

        steps = max(len(files) // self.batch, 1)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        losses = []
        from mo_yolo_tpu.train.trainer import EarlyStopping
        stopper = EarlyStopping(self.patience)
        best_fitness = -float("inf")
        metrics: Dict[str, float] = {}
        for epoch in range(self.epochs):
            order = list(range(len(files)))
            random.Random(self.seed + epoch).shuffle(order)
            ep_loss_dev = []
            for i in range(steps):
                idx = order[i * self.batch:(i + 1) * self.batch]
                if len(idx) < self.batch:
                    break
                imgs = np.concatenate([
                    preprocess(load_image(files[j]), self.imgsz,
                               scale_fill=True)[0] for j in idx])
                ts, loss = step_fn(ts, jnp.asarray(imgs),
                                   jnp.asarray(self._labels[idx]),
                                   jax.random.fold_in(
                                       jax.random.PRNGKey(self.seed),
                                       epoch * steps + i))
                ep_loss_dev.append(loss)        # device scalar, no sync
                self.callbacks.fire("on_train_batch_end", trainer=self,
                                    step=i, metrics={"loss": loss})
                if i % self.log_every == 0:
                    losses.append(float(loss))
                    LOGGER.info(f"classify epoch {epoch} step {i}/{steps} "
                                f"loss {losses[-1]:.4f}")
            self.variables = {"params": ts.ema_params,
                              "batch_stats": ts.batch_stats}
            save_params(str(self.save_dir / "last"), self.variables)
            fitness = -float(jnp.stack(ep_loss_dev).mean()) \
                if ep_loss_dev else 0.0
            if self.val_every and (epoch + 1) % self.val_every == 0 \
                    and val_root is not None:
                metrics = self._accuracy(val_root, classes)
                # reference ClassifyMetrics.fitness = (top1 + top5) / 2
                fitness = (metrics["accuracy_top1"]
                           + metrics["accuracy_top5"]) / 2
                LOGGER.info(f"classify epoch {epoch} val: {metrics}")
            if fitness > best_fitness:
                best_fitness = fitness
                save_params(str(self.save_dir / "best"), self.variables)
            self.callbacks.fire("on_train_epoch_end", trainer=self,
                                epoch=epoch, metrics=metrics)
            if stopper(epoch, fitness):
                LOGGER.info(f"classify early stopping at epoch {epoch}")
                break
        best_dir = self.save_dir / "best"
        if self.val_every and val_root is not None and best_dir.exists():
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.variables = load_params(str(best_dir),
                                         target=self.variables)
            metrics = self._accuracy(val_root, classes)
            LOGGER.info(f"classify final eval (best): {metrics}")
        out = dict(metrics)
        out["final_loss"] = losses[-1] if losses else float("nan")
        self.callbacks.fire("on_train_end", trainer=self, metrics=out)
        return out

    def _accuracy(self, root, classes) -> Dict[str, float]:
        """Top-1/top-5 over a class-subdir tree (reference
        ClassificationValidator, `models/yolo/classify/val.py`)."""
        import glob

        from mo_yolo_tpu.data.letterbox import preprocess
        from mo_yolo_tpu.data.loaders import IMG_EXTS, load_image
        from mo_yolo_tpu.utils.jit_cache import jitted_method

        step = jitted_method(self.model, "__call__")
        top1 = top5 = n = 0
        for ci, c in enumerate(classes):
            for f in glob.glob(str(Path(root) / c / "*")):
                if Path(f).suffix.lower() not in IMG_EXTS:
                    continue
                x, _ = preprocess(load_image(f), self.imgsz,
                                  scale_fill=True)
                logits = np.asarray(step(self.variables,
                                         jnp.asarray(x))[0])
                order = np.argsort(-logits)
                top1 += int(order[0] == ci)
                top5 += int(ci in order[:5])
                n += 1
        return {"accuracy_top1": 100.0 * top1 / max(n, 1),
                "accuracy_top5": 100.0 * top5 / max(n, 1), "n": n}
