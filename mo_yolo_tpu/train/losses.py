"""DETR/MOTR set-prediction losses — masked fixed-shape formulation.

Reference: `MOTRLoss` / `MOTRTrackingLoss` (`ultralytics/utils/loss.py:424-749`)
with gains {class 1, bbox 5, giou 2}: focal class loss scaled by query count
(`loss.py:476`), L1/GIoU *sums* over matched pairs (un-normalized — the
trainer divides the clip total by the clip object count,
`models/MOTRtrack/train.py:251`), per-decoder-layer auxiliary losses
re-matched per layer, and a denoising branch with index-arithmetic matching.

Fixed-shape re-design: GT padded to [B, G] with a mask; a matching is an
int32 array `assign [B, G]` (query index per GT, -1 for padding) instead of
per-image index-tuple lists. All reductions are masked sums — no dynamic
shapes anywhere, so the whole criterion jits and differentiates on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.boxes import elementwise_iou
from mo_yolo_tpu.ops.matching import hungarian_jv, match_cost


@dataclasses.dataclass(frozen=True)
class LossConfig:
    nc: int
    gain_class: float = 1.0
    gain_bbox: float = 5.0
    gain_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 1.5   # reference FocalLoss default (`loss.py:32`)
    use_vfl: bool = True       # reference TrackingModel uses VFL (`tasks.py:309`)


def sigmoid_focal(logits, targets, alpha: float, gamma: float):
    """Elementwise sigmoid focal loss (reference `FocalLoss`, `loss.py:32`)."""
    p = jax.nn.sigmoid(logits)
    bce = optax_sigmoid_bce(logits, targets)
    p_t = targets * p + (1 - targets) * (1 - p)
    mod = (1.0 - p_t) ** gamma
    a_t = targets * alpha + (1 - targets) * (1 - alpha)
    return bce * mod * a_t


def varifocal(logits, gt_score, label, alpha: float = 0.75, gamma: float = 2.0):
    """Varifocal loss (reference `VarifocalLoss`, `loss.py:15`)."""
    p = jax.nn.sigmoid(logits)
    weight = alpha * (p ** gamma) * (1 - label) + gt_score * label
    return optax_sigmoid_bce(logits, gt_score) * weight


def optax_sigmoid_bce(logits, labels):
    """Numerically stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def layer_loss(cfg: LossConfig,
               pred_boxes: jnp.ndarray,    # [B, Q, 4] cxcywh
               pred_logits: jnp.ndarray,   # [B, Q, nc]
               gt_boxes: jnp.ndarray,      # [B, G, 4]
               gt_cls: jnp.ndarray,        # [B, G] int32
               gt_mask: jnp.ndarray,       # [B, G] bool
               assign: jnp.ndarray,        # [B, G] int32 query per GT, -1 pad
               query_mask: Optional[jnp.ndarray] = None,  # [B, Q] bool: queries
               ) -> Dict[str, jnp.ndarray]:
    """One decoder layer's class/bbox/giou loss given a matching.

    `query_mask` restricts which queries contribute background class loss
    (used for the aux-loss-on-detect-queries-only rule, `loss.py:682-696`).
    Matched-pair regression terms are *sums* (reference semantics).
    """
    B, Q, nc = pred_logits.shape
    matched = gt_mask & (assign >= 0)
    a_safe = jnp.clip(assign, 0, Q - 1)

    # gather matched predictions [B, G, ...]
    pb = jnp.take_along_axis(pred_boxes, a_safe[..., None], axis=1)
    m = matched[..., None]

    # regression: masked sums
    l1 = jnp.sum(jnp.abs(pb - gt_boxes) * m)
    giou = elementwise_iou(pb, gt_boxes, xywh=True, giou=True)
    giou_loss = jnp.sum((1.0 - giou) * matched)

    # classification: scatter GT classes onto queries; bg elsewhere
    tgt_onehot = jnp.zeros((B, Q, nc))
    iou_detached = jax.lax.stop_gradient(
        elementwise_iou(pb, gt_boxes, xywh=True))            # [B, G]
    # scatter per batch: one_hot at (assign, gt_cls) weighted by iou (VFL)
    def scatter_b(one, a, c, v, valid):
        idx_q = jnp.where(valid, a, Q)  # drop padding
        upd = jax.nn.one_hot(c, nc) * v[:, None]
        return one.at[idx_q].add(upd, mode="drop")

    labels = jax.vmap(scatter_b)(jnp.zeros((B, Q, nc)), a_safe, gt_cls,
                                 jnp.ones_like(iou_detached), matched)
    labels = jnp.minimum(labels, 1.0)  # duplicate assigns can't exceed 1
    gt_scores = jax.vmap(scatter_b)(jnp.zeros((B, Q, nc)), a_safe, gt_cls,
                                    iou_detached, matched)

    num_gts = jnp.sum(matched)
    if cfg.use_vfl:
        cls_elem = jnp.where(num_gts > 0,
                             varifocal(pred_logits, gt_scores, labels),
                             sigmoid_focal(pred_logits, labels,
                                           cfg.focal_alpha, cfg.focal_gamma))
    else:
        cls_elem = sigmoid_focal(pred_logits, labels, cfg.focal_alpha,
                                 cfg.focal_gamma)
    if query_mask is not None:
        cls_elem = cls_elem * query_mask[..., None]
    # reference: focal.mean(1).sum() * nq  == sum over queries (`loss.py:476`)
    cls_loss = jnp.sum(cls_elem)

    return {
        "loss_class": cfg.gain_class * cls_loss,
        "loss_bbox": cfg.gain_bbox * l1,
        "loss_giou": cfg.gain_giou * giou_loss,
        "num_gts": num_gts,
    }


def matched_layer_losses(cfg: LossConfig, dec_boxes, dec_logits, gt_boxes,
                         gt_cls, gt_mask, last_assign,
                         aux_query_mask: Optional[jnp.ndarray] = None,
                         main_query_mask: Optional[jnp.ndarray] = None,
                         postfix: str = "") -> Dict[str, jnp.ndarray]:
    """Last-layer loss with the given matching + per-layer re-matched aux
    losses (reference `_get_loss_aux`, `loss.py:533-588`).

    dec_boxes/dec_logits: [L, B, Q, ...]; layer L-1 uses `last_assign`,
    layers 0..L-2 are re-matched by Hungarian each (on the aux query subset
    when `aux_query_mask` is given — `loss.py:682-696`).
    `main_query_mask` restricts the LAST layer's background class loss to
    queries that actually participated this frame — our static query
    layout always carries n_slots track rows, but inactive (masked) slots
    are not queries in the reference and must not contribute loss (caught
    by the torch training-parity A/B).
    """
    L = dec_boxes.shape[0]
    out = dict_prefix(layer_loss(cfg, dec_boxes[-1], dec_logits[-1], gt_boxes,
                                 gt_cls, gt_mask, last_assign,
                                 query_mask=main_query_mask), postfix)
    aux = {"loss_class": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
    for i in range(L - 1):
        pb, pl = dec_boxes[i], dec_logits[i]
        if aux_query_mask is not None:
            # restrict matching to the aux subset by inflating other costs
            big = 1e6
            cost = jax.vmap(match_cost)(pb, pl, gt_boxes, gt_cls, gt_mask)
            cost = jnp.where(aux_query_mask[:, :, None], cost, big)
        else:
            cost = jax.vmap(match_cost)(pb, pl, gt_boxes, gt_cls, gt_mask)
        assign_i = hungarian_jv(cost, gt_mask)
        li = layer_loss(cfg, pb, pl, gt_boxes, gt_cls, gt_mask, assign_i,
                        query_mask=aux_query_mask)
        for k in aux:
            aux[k] = aux[k] + li[k]
    out.update(dict_prefix({k: v for k, v in aux.items()}, postfix + "_aux"))
    return out


def dn_losses(cfg: LossConfig, dn_boxes, dn_logits, gt_boxes, gt_cls, gt_mask,
              num_group: int) -> Dict[str, jnp.ndarray]:
    """Denoising branch loss: positives of every group match their GT by
    index arithmetic (reference `get_dn_match_indices`, `loss.py:726-748`).

    dn_boxes/dn_logits: [L, B, Ndn, ...] with Ndn = 2*num_group*G.
    Tiled-GT trick: instead of per-group indices, tile the GT `num_group`
    times and assign positives directly — identical sums, fully static.
    """
    L, B, Ndn, _ = dn_boxes.shape
    G = gt_mask.shape[1]
    k = jnp.arange(num_group)
    pos_idx = (2 * k[:, None] * G + jnp.arange(G)[None, :]).reshape(-1)  # [ng*G]
    gt_boxes_t = jnp.tile(gt_boxes, (1, num_group, 1))
    gt_cls_t = jnp.tile(gt_cls, (1, num_group))
    gt_mask_t = jnp.tile(gt_mask, (1, num_group))
    assign = jnp.broadcast_to(pos_idx[None], (B, num_group * G)).astype(jnp.int32)

    out = {"loss_class_dn": 0.0, "loss_bbox_dn": 0.0, "loss_giou_dn": 0.0}
    # last layer + aux layers all use the same fixed matching
    last = layer_loss(cfg, dn_boxes[-1], dn_logits[-1], gt_boxes_t, gt_cls_t,
                      gt_mask_t, assign)
    out["loss_class_dn"] = last["loss_class"]
    out["loss_bbox_dn"] = last["loss_bbox"]
    out["loss_giou_dn"] = last["loss_giou"]
    aux = {"loss_class": 0.0, "loss_bbox": 0.0, "loss_giou": 0.0}
    for i in range(L - 1):
        li = layer_loss(cfg, dn_boxes[i], dn_logits[i], gt_boxes_t, gt_cls_t,
                        gt_mask_t, assign)
        for key in aux:
            aux[key] = aux[key] + li[key]
    out.update({f"{k}_dn_aux": v for k, v in aux.items()})
    return out


def dict_prefix(d: Dict[str, jnp.ndarray], postfix: str) -> Dict[str, jnp.ndarray]:
    if not postfix:
        return {k: v for k, v in d.items() if k != "num_gts"}
    return {f"{k}{postfix}": v for k, v in d.items() if k != "num_gts"}
