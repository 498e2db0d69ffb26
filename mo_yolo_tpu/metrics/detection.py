"""Detection mAP metrics (host-side numpy).

Equivalent of the reference's `ap_per_class`/`DetMetrics`
(`ultralytics/utils/metrics.py:410-718`): per-class AP over IoU thresholds
0.50:0.95, with 101-point interpolated precision-recall integration, plus
precision/recall at max-F1.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

IOUV = np.linspace(0.5, 0.95, 10)


def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xyxy boxes: [M,4] x [N,4] -> [M,N]."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-12)


def match_predictions(pred_boxes, pred_cls, gt_boxes, gt_cls) -> np.ndarray:
    """TP matrix [n_pred, n_iouv]: greedy-by-IoU class-aware matching
    (semantics of the reference validator's `_process_batch`)."""
    tp = np.zeros((len(pred_boxes), len(IOUV)), bool)
    if len(gt_boxes) == 0 or len(pred_boxes) == 0:
        return tp
    iou = box_iou_np(gt_boxes, pred_boxes)
    correct_cls = gt_cls[:, None] == pred_cls[None, :]
    iou = iou * correct_cls
    for k, t in enumerate(IOUV):
        gi, pi = np.nonzero(iou >= t)
        if len(gi):
            order = np.argsort(-iou[gi, pi])
            gi, pi = gi[order], pi[order]
            used_g, used_p = set(), set()
            for g, p in zip(gi, pi):
                if g not in used_g and p not in used_p:
                    used_g.add(g)
                    used_p.add(p)
                    tp[p, k] = True
    return tp


class DetMetrics:
    """Accumulates per-image stats and computes mAP50 / mAP50-95 / P / R."""

    def __init__(self, nc: int):
        self.nc = nc
        self.tp: List[np.ndarray] = []
        self.conf: List[np.ndarray] = []
        self.pred_cls: List[np.ndarray] = []
        self.target_cls: List[np.ndarray] = []

    def update(self, pred_boxes, pred_conf, pred_cls, gt_boxes, gt_cls):
        """All arrays numpy, boxes xyxy in the same coordinate frame."""
        self.tp.append(match_predictions(pred_boxes, pred_cls, gt_boxes, gt_cls))
        self.conf.append(np.asarray(pred_conf))
        self.pred_cls.append(np.asarray(pred_cls))
        self.target_cls.append(np.asarray(gt_cls))

    def compute(self) -> Dict[str, float]:
        if not self.tp:
            return {"mAP50": 0.0, "mAP50-95": 0.0, "precision": 0.0,
                    "recall": 0.0}
        tp = np.concatenate(self.tp)
        conf = np.concatenate(self.conf)
        pcls = np.concatenate(self.pred_cls)
        tcls = np.concatenate(self.target_cls)
        order = np.argsort(-conf)
        tp, conf, pcls = tp[order], conf[order], pcls[order]

        classes = np.unique(tcls).astype(int)
        ap = np.zeros((len(classes), len(IOUV)))
        p_out, r_out = [], []
        for ci, c in enumerate(classes):
            m = pcls == c
            n_gt = int((tcls == c).sum())
            if m.sum() == 0 or n_gt == 0:
                continue
            fpc = np.cumsum(~tp[m], 0)
            tpc = np.cumsum(tp[m], 0)
            recall = tpc / n_gt
            precision = tpc / np.maximum(tpc + fpc, 1e-12)
            for k in range(len(IOUV)):
                ap[ci, k] = _compute_ap(recall[:, k], precision[:, k])
            # P/R at max-F1 (IoU 0.5 column)
            f1 = 2 * precision[:, 0] * recall[:, 0] / np.maximum(
                precision[:, 0] + recall[:, 0], 1e-12)
            i = int(np.argmax(f1)) if len(f1) else 0
            p_out.append(precision[i, 0])
            r_out.append(recall[i, 0])
        return {
            "mAP50": 100 * float(ap[:, 0].mean()) if len(classes) else 0.0,
            "mAP50-95": 100 * float(ap.mean()) if len(classes) else 0.0,
            "precision": 100 * float(np.mean(p_out)) if p_out else 0.0,
            "recall": 100 * float(np.mean(r_out)) if r_out else 0.0,
        }


def _compute_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """101-point interpolated AP (COCO style, as the reference's
    `compute_ap` with method='interp')."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    return float(np.trapezoid(np.interp(x, mrec, mpre), x))


class ConfusionMatrix:
    """Detection confusion matrix (reference `utils/metrics.py:177`):
    class-aware TP assignment at a single IoU threshold, with background
    row/column for FP/FN."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thresh: float = 0.45):
        self.nc = nc
        self.conf = conf
        self.iou_thresh = iou_thresh
        self.matrix = np.zeros((nc + 1, nc + 1), np.int64)  # [pred, gt]

    def update(self, pred_boxes, pred_conf, pred_cls, gt_boxes, gt_cls):
        keep = np.asarray(pred_conf) >= self.conf
        pb = np.asarray(pred_boxes)[keep]
        pc = np.asarray(pred_cls)[keep].astype(int)
        gb = np.asarray(gt_boxes)
        gc = np.asarray(gt_cls).astype(int)
        if len(gb) == 0:
            for c in pc:
                self.matrix[c, self.nc] += 1  # FP vs background
            return
        if len(pb) == 0:
            for c in gc:
                self.matrix[self.nc, c] += 1  # FN
            return
        iou = box_iou_np(gb, pb)
        gi, pi = np.nonzero(iou >= self.iou_thresh)
        used_g, used_p = set(), set()
        order = np.argsort(-iou[gi, pi])
        for g, p in zip(gi[order], pi[order]):
            if g in used_g or p in used_p:
                continue
            used_g.add(g)
            used_p.add(p)
            self.matrix[pc[p], gc[g]] += 1
        for g in range(len(gb)):
            if g not in used_g:
                self.matrix[self.nc, gc[g]] += 1
        for p in range(len(pb)):
            if p not in used_p:
                self.matrix[pc[p], self.nc] += 1
