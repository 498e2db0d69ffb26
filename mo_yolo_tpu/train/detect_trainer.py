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
        d = tcfg.ema_decay
        ema = jax.tree.map(lambda e, p: e * d + p * (1 - d), ts.ema_params,
                           params)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, bstats, opt_state, ema, ts.step + 1), metrics

    return init_fn, step_fn
