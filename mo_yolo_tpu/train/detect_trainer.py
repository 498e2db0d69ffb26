"""Detection-task training step (RT-DETR-style with CDN denoising).

The detect twin of the track training path: per-image (no clip recurrence,
no track slots) — decoder over [dn | detect] queries, last-layer Hungarian
matching, per-layer aux + encoder-layer + denoising losses (same criterion
as `MOTRLoss` without the track-aware association; the reference trains its
detect/RTDETR family with exactly this loss, `utils/loss.py:424`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from mo_yolo_tpu.ops.denoising import build_cdn_group
from mo_yolo_tpu.ops.matching import hungarian_jv, match_cost
from mo_yolo_tpu.train.losses import (
    LossConfig, dn_losses, layer_loss, matched_layer_losses)
from mo_yolo_tpu.train.train_step import TrainConfig, TrainState, make_optimizer


def detect_loss_fn(model, lcfg: LossConfig, params, batch_stats, batch, key):
    """batch: images [B,H,W,3], gt_cls [B,G], gt_boxes [B,G,4] cxcywh,
    gt_mask [B,G]. Returns (loss, (new_batch_stats, metrics))."""
    cdn = build_cdn_group(key, batch["gt_cls"], batch["gt_boxes"],
                          batch["gt_mask"], model.spec.nc, n_main=model.nq)
    out, mut = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["images"], True, cdn.dn_cls, cdn.dn_bbox_logit, cdn.attn_mask,
        mutable=["batch_stats"])
    n_dn = cdn.num_dn
    boxes, logits = out["dec_bboxes"], out["dec_scores"]
    dn_boxes, det_boxes = boxes[:, :, :n_dn], boxes[:, :, n_dn:]
    dn_logits, det_logits = logits[:, :, :n_dn], logits[:, :, n_dn:]

    gt_boxes, gt_cls, gt_mask = (batch["gt_boxes"], batch["gt_cls"],
                                 batch["gt_mask"])
    cost = jax.vmap(match_cost)(det_boxes[-1], det_logits[-1], gt_boxes,
                                gt_cls, gt_mask)
    assign = hungarian_jv(cost, gt_mask)
    terms = matched_layer_losses(lcfg, det_boxes, det_logits, gt_boxes,
                                 gt_cls, gt_mask, assign)
    enc_cost = jax.vmap(match_cost)(out["enc_bboxes"], out["enc_scores"],
                                    gt_boxes, gt_cls, gt_mask)
    enc = layer_loss(lcfg, out["enc_bboxes"], out["enc_scores"], gt_boxes,
                     gt_cls, gt_mask, hungarian_jv(enc_cost, gt_mask))
    terms["loss_class_enc"] = enc["loss_class"]
    terms["loss_bbox_enc"] = enc["loss_bbox"]
    terms["loss_giou_enc"] = enc["loss_giou"]
    terms.update(dn_losses(lcfg, dn_boxes, dn_logits, gt_boxes, gt_cls,
                           gt_mask, cdn.num_group))
    nobj = jnp.maximum(jnp.sum(gt_mask), 1.0)
    total = sum(v for k, v in terms.items() if k.startswith("loss")) / nobj
    metrics = {k: v / nobj for k, v in terms.items()}
    metrics["num_objects"] = nobj
    return total, (mut["batch_stats"], metrics)


class DetectTrainer:
    """Host driver for detection training (the detect analogue of
    `TrackTrainer`; reference `DetectionTrainer`, `models/yolo/detect/`):
    epochs over shuffled image batches, EMA, per-epoch checkpoints, and a
    standalone mAP validation hook."""

    def __init__(self, api_model, data: str, epochs: int = 1, batch: int = 8,
                 lr: float = 1e-4, max_gt: int = 64,
                 save_dir: str = "runs/detect", seed: int = 0,
                 log_every: int = 10, val_every: int = -1,
                 augment: bool = False, hyp=None, close_mosaic: int = 0,
                 fraction: float = 1.0, val: bool = True, pretrained=None,
                 patience: int = 50, callbacks=None, plots: bool = True):
        from mo_yolo_tpu.utils.callbacks import default_callbacks
        # same 26-event bus as TrackTrainer (reference BaseTrainer
        # `run_callbacks`, engine/trainer.py:167) — integrations attach here
        self.callbacks = callbacks or default_callbacks(save_dir)
        self.api = api_model
        self.data = data
        self.epochs = epochs
        self.batch = batch
        self.lr = lr
        self.max_gt = max_gt
        self.save_dir = save_dir
        self.seed = seed
        self.log_every = log_every
        # -1 = auto: validate every epoch when the dataset has a val split
        # (reference default); 0 = off; N = every N epochs
        self.val_every = val_every
        self.patience = patience
        self.augment = augment
        self.hyp = dict(hyp or {})
        self.close_mosaic = close_mosaic
        # reference `fraction`: train on the first fraction of the dataset
        self.fraction = min(max(float(fraction), 0.0), 1.0) or 1.0
        if not val:     # reference `val` bool beats val_every
            self.val_every = 0
        # reference `pretrained`: load saved weights before training
        self.pretrained = pretrained if isinstance(pretrained, str) else None
        self.plots = plots

    def run(self):
        import random
        import time
        from pathlib import Path

        import numpy as np

        from mo_yolo_tpu.data.dataset import TrackDataset, load_dataset_yaml
        from mo_yolo_tpu.utils.checkpoint import save_params
        from mo_yolo_tpu.utils.logging import LOGGER

        self.callbacks.fire("on_train_start", trainer=self)
        d = load_dataset_yaml(self.data)
        if self.val_every < 0:      # auto: reference validates every epoch
            self.val_every = 1 if d.get("val") else 0
        if self.fraction < 1.0:
            keep = max(int(round(len(d["train"]) * self.fraction)), 1)
            LOGGER.info(f"fraction={self.fraction}: {keep}/"
                        f"{len(d['train'])} train images")
            d["train"] = d["train"][:keep]
        augmenter = None
        mosaic_p = mixup_p = 0.0
        if self.augment:
            from mo_yolo_tpu.data.augment import ClipAugmenter
            h = self.hyp
            augmenter = ClipAugmenter(
                hsv_h=float(h.get("hsv_h", 0.015)),
                hsv_s=float(h.get("hsv_s", 0.7)),
                hsv_v=float(h.get("hsv_v", 0.4)),
                fliplr_p=float(h.get("fliplr", 0.5)),
                flipud_p=float(h.get("flipud", 0.0)),
                degrees=float(h.get("degrees", 0.0)),
                translate=float(h.get("translate", 0.05)),
                scale=float(h.get("scale", 0.2)),
                shear=float(h.get("shear", 0.0)),
                perspective=float(h.get("perspective", 0.0)),
                seed=self.seed)
            # detection training gets the multi-image augs (reference
            # v8_transforms: Mosaic + CopyPaste + MixUp)
            mosaic_p = float(self.hyp.get("mosaic", 1.0))
            mixup_p = float(self.hyp.get("mixup", 0.0))
        ds = TrackDataset(d["train"], imgsz=self.api.imgsz,
                          max_gt=self.max_gt, clip_len=1,
                          augmenter=augmenter, verify=True,
                          cache_images=True, mosaic_p=mosaic_p,
                          mixup_p=mixup_p,
                          copy_paste_p=float(self.hyp.get("copy_paste", 0.0))
                          if self.augment else 0.0,
                          aug_seed=self.seed)
        model = self.api.model
        lcfg = LossConfig(nc=model.spec.nc)
        steps_per_epoch = max(len(ds) // self.batch, 1)
        h = self.hyp
        wu = {}
        if "warmup_epochs" in h:    # reference warmup_epochs (default 3.0)
            wu["warmup_steps"] = max(
                int(float(h["warmup_epochs"]) * steps_per_epoch), 1)
        tcfg = TrainConfig(clip_len=1, lr=self.lr,
                           total_steps=max(self.epochs * steps_per_epoch, 1),
                           optimizer=str(h.get("optimizer", "adamw")),
                           momentum=float(h.get("momentum", 0.937)),
                           cos_lr=bool(h.get("cos_lr", True)),
                           lrf=float(h.get("lrf", 0.01)),
                           warmup_momentum=float(h.get("warmup_momentum", 0.8)),
                           warmup_bias_lr=float(h.get("warmup_bias_lr", 0.0)),
                           **wu)
        init_fn, step_fn = make_detect_train_step(model, lcfg, tcfg)
        step_fn = jax.jit(step_fn)
        if self.pretrained:
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.api.variables = load_params(self.pretrained,
                                             target=self.api.variables)
            LOGGER.info(f"pretrained weights loaded from {self.pretrained}")
        ts = init_fn(self.api.variables)
        key = jax.random.PRNGKey(self.seed)
        save_dir = Path(self.save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        if self.plots:
            # labels.jpg + labels_correlogram.jpg (reference plot_labels
            # from BaseTrainer when plots=True) — cached rows, no decode
            try:
                from mo_yolo_tpu.utils.plotting import (
                    plot_labels, plot_labels_correlogram)
                rows = [ds._label(i) for i in range(len(ds))]
                rows = [r for r in rows if len(r)]
                if rows:
                    lab = np.concatenate(rows, axis=0)
                    plot_labels(lab[:, 0], lab[:, 1:5],
                                str(save_dir / "labels.jpg"))
                    plot_labels_correlogram(
                        lab[:, 1:5], str(save_dir / "labels_correlogram.jpg"))
            except Exception as e:
                LOGGER.warning(f"label plots failed: {e}")
        losses = []
        from mo_yolo_tpu.train.trainer import EarlyStopping
        stopper = EarlyStopping(self.patience)
        best_fitness = -float("inf")
        metrics = {}
        for epoch in range(self.epochs):
            if self.close_mosaic and \
                    epoch >= self.epochs - self.close_mosaic and \
                    ds.mosaic_p > 0:
                # reference `close_mosaic`: mosaic off for the last N
                # epochs so boxes see clean statistics before the end
                LOGGER.info(f"epoch {epoch}: closing mosaic")
                ds.mosaic_p = 0.0
            order = list(range(len(ds)))
            random.Random(self.seed + epoch).shuffle(order)
            t_ep = time.time()
            ep_loss_dev = []
            for i in range(steps_per_epoch):
                idxs = order[i * self.batch:(i + 1) * self.batch]
                if len(idxs) < self.batch:
                    break
                frames = []
                for j in idxs:
                    if augmenter is not None:
                        # single-image task: fresh geometric params per
                        # frame (clip freezing is for video training)
                        augmenter.begin_clip(epoch * len(ds) + j)
                    frames.append(ds.load_frame(
                        j, augment=self.augment,
                        aug_index=epoch * len(ds) + j))
                batch = {
                    "images": jnp.asarray(
                        np.stack([f.image for f in frames])),
                    "gt_cls": jnp.asarray(np.stack([f.cls for f in frames])),
                    "gt_boxes": jnp.asarray(
                        np.stack([f.boxes for f in frames])),
                    "gt_mask": jnp.asarray(
                        np.stack([f.mask for f in frames])),
                }
                if self.plots and epoch == 0 and i < 3:
                    # train_batch{i}.jpg (reference plot_training_samples)
                    try:
                        from mo_yolo_tpu.utils.plotting import \
                            save_train_batch
                        save_train_batch(
                            np.stack([f.image for f in frames]),
                            np.stack([f.boxes for f in frames]),
                            str(save_dir / f"train_batch{i}.jpg"),
                            mask=np.stack([f.mask for f in frames]))
                    except Exception as e:
                        LOGGER.warning(f"train-batch plot failed: {e}")
                key, k = jax.random.split(key)
                ts, m = step_fn(ts, batch, k)
                ep_loss_dev.append(m["loss"])   # device scalar, no sync
                self.callbacks.fire("on_train_batch_end", trainer=self,
                                    step=i, metrics=m)
                if i % self.log_every == 0:
                    loss = float(m["loss"])
                    losses.append(loss)
                    LOGGER.info(f"detect epoch {epoch} step "
                                f"{i}/{steps_per_epoch} loss {loss:.4f}")
            self.api.variables = {"params": ts.ema_params,
                                  "batch_stats": ts.batch_stats}
            save_params(str(save_dir / "last"), self.api.variables)
            # best-checkpoint fitness: val mAP when validating (reference
            # fitness = 0.1*mAP50 + 0.9*mAP50-95, `utils/metrics.py:89`),
            # else -mean(epoch loss) as the loss-only fallback
            fitness = -float(jnp.stack(ep_loss_dev).mean()) \
                if ep_loss_dev else 0.0
            if self.val_every and (epoch + 1) % self.val_every == 0 \
                    and d.get("val"):
                metrics = self.api.val(d["val"])
                fitness = 0.1 * metrics.get("mAP50", 0.0) \
                    + 0.9 * metrics.get("mAP50-95", 0.0)
                LOGGER.info(f"detect epoch {epoch} val: {metrics}")
            if fitness > best_fitness:
                best_fitness = fitness
                save_params(str(save_dir / "best"), self.api.variables)
            self.callbacks.fire("on_train_epoch_end", trainer=self,
                                epoch=epoch, metrics=metrics)
            LOGGER.info(f"detect epoch {epoch} done in "
                        f"{time.time() - t_ep:.1f}s")
            if stopper(epoch, fitness):
                LOGGER.info(f"early stopping at epoch {epoch} "
                            f"(best epoch {stopper.best_epoch})")
                break
        # final eval of BEST (reference `BaseTrainer.final_eval`): report
        # best's metrics and leave the live model on the best weights
        best_dir = save_dir / "best"
        if self.val_every and d.get("val") and best_dir.exists():
            from mo_yolo_tpu.utils.checkpoint import load_params
            self.api.variables = load_params(str(best_dir),
                                             target=self.api.variables)
            metrics = self.api.val(d["val"])
            LOGGER.info(f"detect final eval (best): {metrics}")
        out = dict(metrics)
        out["final_loss"] = losses[-1] if losses else float("nan")
        self.callbacks.fire("on_train_end", trainer=self, metrics=out)
        return out


def make_detect_train_step(model, lcfg: LossConfig, tcfg: TrainConfig,
                           tx=None):
    tx = tx or make_optimizer(tcfg)

    def init_fn(variables) -> TrainState:
        params = variables["params"]
        return TrainState(params=params,
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(params),
                          ema_params=jax.tree.map(lambda x: x.copy(), params),
                          step=jnp.zeros((), jnp.int32))

    def step_fn(ts: TrainState, batch, key):
        (loss, (bstats, metrics)), grads = jax.value_and_grad(
            lambda p: detect_loss_fn(model, lcfg, p, ts.batch_stats, batch,
                                     key), has_aux=True)(ts.params)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        # ramped decay (reference ModelEMA): EMA must track params closely
        # early in training
        d = tcfg.ema_decay * (1.0 - jnp.exp(
            -(ts.step.astype(jnp.float32) + 1.0) / 2000.0))
        ema = jax.tree.map(lambda e, p: e * d + p * (1 - d), ts.ema_params,
                           params)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, bstats, opt_state, ema, ts.step + 1), metrics

    return init_fn, step_fn
