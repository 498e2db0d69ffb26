"""YOLOv8 detection loss: task-aligned assignment + BCE/CIoU/DFL.

Equivalent of the reference `v8DetectionLoss` + `TaskAlignedAssigner`
(`utils/loss.py:130-228`, `utils/tal.py`): anchors inside GT boxes are
candidates, alignment = cls_score^alpha * IoU^beta, top-k per GT with
multi-assignment resolved by IoU; loss = BCE over aligned target scores +
CIoU box loss + distribution-focal loss over DFL bins, with gains
box 7.5 / cls 0.5 / dfl 1.5.

Fixed shapes: GT padded to [B, G] with a mask; everything jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.boxes import elementwise_ciou, pairwise_ciou
from mo_yolo_tpu.train.losses import optax_sigmoid_bce

# COCO 17-keypoint OKS sigmas (reference `utils/metrics.py:OKS_SIGMA`)
_OKS_SIGMA_COCO17 = [.026, .025, .025, .035, .035, .079, .079, .072, .072,
                     .062, .062, .107, .107, .087, .087, .089, .089]


@dataclasses.dataclass(frozen=True)
class V8LossConfig:
    nc: int
    reg_max: int = 16
    topk: int = 10
    alpha: float = 0.5
    beta: float = 6.0
    gain_box: float = 7.5
    gain_cls: float = 0.5
    gain_dfl: float = 1.5


def task_aligned_assign(cfg: V8LossConfig,
                        pd_scores: jnp.ndarray,   # [B,S,nc] sigmoided
                        pd_bboxes: jnp.ndarray,   # [B,S,4] xyxy (px)
                        anc_points: jnp.ndarray,  # [S,2] centers (px)
                        gt_labels: jnp.ndarray,   # [B,G] int32
                        gt_bboxes: jnp.ndarray,   # [B,G,4] xyxy (px)
                        gt_mask: jnp.ndarray):    # [B,G] bool
    """Returns (target_labels [B,S], target_bboxes [B,S,4],
    target_scores [B,S,nc], fg_mask [B,S], assigned_gt [B,S])."""
    B, S, nc = pd_scores.shape
    G = gt_labels.shape[1]

    # candidates: anchor center strictly inside the GT box
    ax = anc_points[None, None, :, 0]
    ay = anc_points[None, None, :, 1]
    in_gt = ((ax > gt_bboxes[..., 0:1]) & (ax < gt_bboxes[..., 2:3]) &
             (ay > gt_bboxes[..., 1:2]) & (ay < gt_bboxes[..., 3:4]))  # [B,G,S]
    in_gt = in_gt & gt_mask[..., None]

    # alignment metric: CIoU clamped at 0, matching the reference assigner
    # (`utils/tal.py:157` bbox_iou(..., CIoU=True).clamp_(0))
    iou = jax.vmap(pairwise_ciou)(gt_bboxes, pd_bboxes)             # [B,G,S]
    iou = jnp.clip(iou, 0.0)
    cls_score = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1),                                # [B,nc,S]
        jnp.clip(gt_labels, 0, nc - 1)[..., None], axis=1)           # [B,G,S]
    metric = (cls_score ** cfg.alpha) * (iou ** cfg.beta)
    metric = jnp.where(in_gt, metric, 0.0)

    # top-k anchors per GT
    topk_vals, topk_idx = jax.lax.top_k(metric, cfg.topk)            # [B,G,k]
    topk_ok = topk_vals > 1e-9
    cand = jnp.zeros((B, G, S), bool)
    cand = jax.vmap(jax.vmap(
        lambda c, idx, ok: c.at[jnp.where(ok, idx, S)].set(True, mode="drop")
    ))(cand, topk_idx, topk_ok)

    # resolve anchors claimed by multiple GTs: keep highest-IoU GT
    n_claims = cand.sum(axis=1)                                      # [B,S]
    best_gt = jnp.argmax(jnp.where(cand, iou, -1.0), axis=1)         # [B,S]
    keep = cand & (jnp.arange(G)[None, :, None] == best_gt[:, None, :])
    cand = jnp.where((n_claims > 1)[:, None, :], keep, cand)

    fg_mask = cand.any(axis=1)                                       # [B,S]
    assigned_gt = jnp.argmax(cand, axis=1)                           # [B,S]

    take_g = lambda arr: jnp.take_along_axis(arr, assigned_gt[:, :, None]
                                             if arr.ndim == 3 else assigned_gt,
                                             axis=1)
    target_labels = jnp.take_along_axis(gt_labels, assigned_gt, axis=1)
    target_bboxes = jnp.take_along_axis(gt_bboxes, assigned_gt[..., None],
                                        axis=1)
    # normalized target scores (tal.py: metric scaled by per-GT max IoU/metric)
    m_max = metric.max(axis=2, keepdims=True)                        # [B,G,1]
    i_max = iou.max(axis=2, keepdims=True)
    norm = metric * i_max / jnp.maximum(m_max, 1e-9)                 # [B,G,S]
    norm_a = jnp.take_along_axis(
        norm.transpose(0, 2, 1), assigned_gt[..., None], axis=2)[..., 0]
    onehot = jax.nn.one_hot(target_labels, nc)
    target_scores = onehot * (norm_a * fg_mask)[..., None]
    return target_labels, target_bboxes, target_scores, fg_mask, assigned_gt


def v8_detection_loss(cfg: V8LossConfig,
                      box_dist: jnp.ndarray,     # [B,S,4,reg_max] raw DFL
                      cls_logits: jnp.ndarray,   # [B,S,nc] raw logits
                      anc_points: jnp.ndarray,   # [S,2] centers in CELLS
                      strides: jnp.ndarray,      # [S]
                      gt_labels, gt_bboxes_xyxy, gt_mask) -> Dict[str, jnp.ndarray]:
    """gt boxes in input pixels (xyxy). Returns loss dict + total."""
    B, S, _, R = box_dist.shape
    # decode boxes (same math as YoloDetectHead)
    dist = jnp.sum(jax.nn.softmax(box_dist, -1) *
                   jnp.arange(R, dtype=box_dist.dtype), -1)          # [B,S,4]
    x1y1 = (anc_points[None] - dist[..., :2]) * strides[None, :, None]
    x2y2 = (anc_points[None] + dist[..., 2:]) * strides[None, :, None]
    pd_bboxes = jnp.concatenate([x1y1, x2y2], -1)
    pd_scores = jax.nn.sigmoid(cls_logits)

    anc_px = anc_points * strides[:, None]
    tl, tb, ts, fg, _ = task_aligned_assign(cfg, pd_scores, pd_bboxes, anc_px,
                                            gt_labels, gt_bboxes_xyxy, gt_mask)
    ts_sum = jnp.maximum(ts.sum(), 1.0)

    # cls: BCE over all anchors against aligned target scores
    cls_loss = optax_sigmoid_bce(cls_logits, ts).sum() / ts_sum

    # box: CIoU weighted by target score at fg anchors
    w = ts.sum(-1) * fg                                              # [B,S]
    ciou = elementwise_ciou(pd_bboxes, tb, xywh=False)
    box_loss = jnp.sum((1.0 - ciou) * w) / ts_sum

    # dfl: distribution focal on lt/rb cell distances
    t_lt = (anc_points[None] - tb[..., :2] / strides[None, :, None])
    t_rb = (tb[..., 2:] / strides[None, :, None] - anc_points[None])
    tdist = jnp.clip(jnp.concatenate([t_lt, t_rb], -1), 0, R - 1 - 0.01)
    tl_i = jnp.floor(tdist)
    wr = tdist - tl_i
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(box_dist, -1)
    gather = lambda idx: jnp.take_along_axis(
        logp, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
    dfl = -(gather(tl_i) * wl + gather(jnp.minimum(tl_i + 1, R - 1)) * wr)
    dfl_loss = jnp.sum(dfl.mean(-1) * w) / ts_sum

    total = (cfg.gain_box * box_loss + cfg.gain_cls * cls_loss +
             cfg.gain_dfl * dfl_loss)
    return {"loss": total, "box": box_loss, "cls": cls_loss, "dfl": dfl_loss,
            "fg": fg.sum()}


def _assignment(cfg, box_dist, cls_logits, anc_points, strides, gt_labels,
                gt_bboxes_xyxy, gt_mask):
    """Shared TAL assignment for the composite task losses. Returns
    (target_bboxes, target_scores, fg [B,S], assigned_gt [B,S])."""
    R = box_dist.shape[-1]
    dist = jnp.sum(jax.nn.softmax(box_dist, -1) *
                   jnp.arange(R, dtype=box_dist.dtype), -1)
    x1y1 = (anc_points[None] - dist[..., :2]) * strides[None, :, None]
    x2y2 = (anc_points[None] + dist[..., 2:]) * strides[None, :, None]
    pd_bboxes = jnp.concatenate([x1y1, x2y2], -1)
    pd_scores = jax.nn.sigmoid(cls_logits)
    anc_px = anc_points * strides[:, None]
    _, tb, ts, fg, assigned_gt = task_aligned_assign(
        cfg, pd_scores, pd_bboxes, anc_px, gt_labels, gt_bboxes_xyxy, gt_mask)
    return tb, ts, fg, assigned_gt


def v8_segmentation_loss(cfg: V8LossConfig,
                         box_dist, cls_logits, anc_points, strides,
                         coef,           # [B,S,nm]
                         protos,         # [B,Hp,Wp,nm]
                         gt_labels, gt_bboxes_xyxy, gt_mask,
                         gt_masks,       # [B,G,Hp,Wp] binary at proto res
                         imgsz: float,
                         gain_mask: Optional[float] = None
                         ) -> Dict[str, jnp.ndarray]:
    """v8 segmentation loss (reference `v8SegmentationLoss`,
    `utils/loss.py:229-321`): detect loss + per-fg-anchor BCE between
    (coef @ protos) and the assigned GT mask, cropped (half-open, like
    `ops.crop_mask`) to the assigned box and normalized by box area.
    Reference normalization: UNWEIGHTED mean over each image's fg
    anchors, then mean over the batch, scaled by the BOX gain
    (`loss[1] *= self.hyp.box / batch_size`)."""
    det = v8_detection_loss(cfg, box_dist, cls_logits, anc_points, strides,
                            gt_labels, gt_bboxes_xyxy, gt_mask)
    tb, ts, fg, assigned = _assignment(cfg, box_dist, cls_logits, anc_points,
                                       strides, gt_labels, gt_bboxes_xyxy,
                                       gt_mask)
    B, S, nm = coef.shape
    Hp, Wp = protos.shape[1:3]
    # predicted mask logits per anchor: [B,S,Hp,Wp]
    pred = jnp.einsum("bsn,bhwn->bshw", coef, protos)
    # assigned GT mask per anchor
    tgt = jnp.take_along_axis(gt_masks, assigned[:, :, None, None], axis=1)
    # crop to the assigned GT box (normalized to proto grid)
    box = jnp.take_along_axis(gt_bboxes_xyxy, assigned[..., None], axis=1)
    sx = Wp / imgsz
    sy = Hp / imgsz
    xs = jnp.arange(Wp, dtype=jnp.float32)[None, None, None, :]
    ys = jnp.arange(Hp, dtype=jnp.float32)[None, None, :, None]
    inside = ((xs >= box[..., 0:1, None] * sx) &
              (xs < box[..., 2:3, None] * sx) &
              (ys >= box[..., 1:2, None] * sy) &
              (ys < box[..., 3:4, None] * sy))
    bce = optax_sigmoid_bce(pred, tgt) * inside
    # reference: crop(loss).mean(plane) / normalized-box-area ==
    # crop(loss).sum(plane) / box-area-in-proto-cells
    area = jnp.maximum((box[..., 2] - box[..., 0]) *
                       (box[..., 3] - box[..., 1]) * sx * sy, 1e-9)  # [B,S]
    per_anchor = bce.sum(axis=(2, 3)) / area
    n_fg = jnp.maximum(fg.sum(-1), 1.0)                              # [B]
    mask_loss = jnp.mean((per_anchor * fg).sum(-1) / n_fg)
    g = cfg.gain_box if gain_mask is None else gain_mask
    total = det["loss"] + g * mask_loss
    return {"loss": total, "box": det["box"], "cls": det["cls"],
            "dfl": det["dfl"], "mask": mask_loss, "fg": det["fg"]}


def v8_pose_loss(cfg: V8LossConfig,
                 box_dist, cls_logits, anc_points, strides,
                 pred_kpts,      # [B,S,K,3] decoded xy px + vis logit
                 gt_labels, gt_bboxes_xyxy, gt_mask,
                 gt_kpts,        # [B,G,K,3] xy px + visibility {0,1,2}
                 gain_pose: float = 12.0,
                 gain_kobj: float = 1.0) -> Dict[str, jnp.ndarray]:
    """v8 pose loss (reference `v8PoseLoss` + `KeypointLoss`,
    `utils/loss.py:331-420`): detect loss + OKS-style keypoint regression
    at fg anchors + BCE on keypoint visibility."""
    det = v8_detection_loss(cfg, box_dist, cls_logits, anc_points, strides,
                            gt_labels, gt_bboxes_xyxy, gt_mask)
    tb, ts, fg, assigned = _assignment(cfg, box_dist, cls_logits, anc_points,
                                       strides, gt_labels, gt_bboxes_xyxy,
                                       gt_mask)
    K = pred_kpts.shape[2]
    tkpt = jnp.take_along_axis(gt_kpts, assigned[:, :, None, None], axis=1)
    box = jnp.take_along_axis(gt_bboxes_xyxy, assigned[..., None], axis=1)
    # raw assigned-box area like the reference (no clamp; the 1e-9 eps
    # below keeps padded slots finite and fg masks them out)
    area = (box[..., 2] - box[..., 0]) * (box[..., 3] - box[..., 1])
    vis = (tkpt[..., 2] > 0).astype(jnp.float32)                  # [B,S,K]
    d2 = jnp.sum((pred_kpts[..., :2] - tkpt[..., :2]) ** 2, -1)   # [B,S,K]
    # reference KeypointLoss (`utils/loss.py:114-127`):
    #   e = d / (2*sigma)^2 / (area + eps) / 2, with per-keypoint OKS
    # sigmas for COCO-17 pose else uniform 1/K (`utils/loss.py:332`);
    # kpt_loss_factor * mean over (fg x K) collapses to
    # sum((1-exp(-e))*vis) / visible_count PER IMAGE, then the per-image
    # sums are averaged over the batch (`loss[1] *= hyp.pose/batch_size`)
    sigmas = (jnp.asarray(_OKS_SIGMA_COCO17) if K == 17
              else jnp.full((K,), 1.0 / K, jnp.float32))
    e = d2 / ((2 * sigmas[None, None]) ** 2 *
              (area[..., None] + 1e-9) * 2)
    fgk = fg[..., None] * vis                                     # [B,S,K]
    pose_loss = jnp.mean(
        jnp.sum((1.0 - jnp.exp(-e)) * fgk, (1, 2)) /
        (jnp.sum(fgk, (1, 2)) + 1e-9))
    # kobj: BCEWithLogits MEAN over each image's (fg x K) set
    kobj = optax_sigmoid_bce(pred_kpts[..., 2], vis) * fg[..., None]
    kobj_loss = jnp.mean(kobj.sum((1, 2)) /
                         jnp.maximum(fg.sum(-1) * K, 1.0))
    total = det["loss"] + gain_pose * pose_loss + gain_kobj * kobj_loss
    return {"loss": total, "box": det["box"], "cls": det["cls"],
            "dfl": det["dfl"], "pose": pose_loss, "kobj": kobj_loss,
            "fg": det["fg"]}


def classification_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                        label_smoothing: float = 0.0) -> jnp.ndarray:
    """Image-classification cross entropy (reference
    `v8ClassificationLoss`, `utils/loss.py`). `label_smoothing` follows
    torch `CrossEntropyLoss(label_smoothing=...)`: targets become
    (1-s)*onehot + s/nc (the reference exposes the `label_smoothing`
    hyp key, `cfg/default.yaml`)."""
    logp = jax.nn.log_softmax(logits, -1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if label_smoothing > 0.0:
        s = label_smoothing
        nll = (1.0 - s) * nll + s * (-logp.mean(-1))
    return jnp.mean(nll)
