"""CLEAR-MOT (MOTA/MOTP/IDSW) and identity (IDF1) metrics + MOT writer.

Host-side numpy equivalents of the reference's motmetrics-based evaluation
(`MOTR/util/evaluation.py:15-171`) and the MOT-challenge submission writer
(`MOTR/submit.py:410-419`, format `frame,id,x1,y1,w,h,1,-1,-1,-1`).
"""

from __future__ import annotations

from typing import Dict, Sequence, TextIO

import numpy as np
from scipy.optimize import linear_sum_assignment


def clear_mot(gt_ids: Sequence[np.ndarray], pred_ids: Sequence[np.ndarray],
              similarity: Sequence[np.ndarray],
              iou_thresh: float = 0.5) -> Dict[str, float]:
    """CLEAR-MOT over one sequence.

    Matching per frame keeps the previous frame's correspondences when still
    valid (the CLEAR continuity rule), then Hungarian-matches the rest.
    """
    tp = fp = fn = idsw = 0
    dist_sum = 0.0
    n_gt_total = 0
    last_match: Dict[int, int] = {}  # gt id -> pred id
    for g, p, s in zip(gt_ids, pred_ids, similarity):
        g = np.asarray(g, int).ravel()
        p = np.asarray(p, int).ravel()
        s = np.asarray(s, float).reshape(len(g), len(p))
        n_gt_total += len(g)
        matched_g, matched_p = [], []
        # continuity: keep previous pairs if both present and IoU ok
        pidx = {v: i for i, v in enumerate(p)}
        for i, gid in enumerate(g):
            pr = last_match.get(gid)
            if pr is not None and pr in pidx and s[i, pidx[pr]] >= iou_thresh:
                matched_g.append(i)
                matched_p.append(pidx[pr])
        free_g = [i for i in range(len(g)) if i not in set(matched_g)]
        free_p = [j for j in range(len(p)) if j not in set(matched_p)]
        if free_g and free_p:
            sub = s[np.ix_(free_g, free_p)]
            r, c = linear_sum_assignment(-sub)
            for ri, ci in zip(r, c):
                if sub[ri, ci] >= iou_thresh:
                    matched_g.append(free_g[ri])
                    matched_p.append(free_p[ci])
        # bookkeeping
        new_match = {}
        for gi, pj in zip(matched_g, matched_p):
            gid, pid = g[gi], p[pj]
            if gid in last_match and last_match[gid] != pid:
                idsw += 1
            new_match[gid] = pid
            dist_sum += s[gi, pj]
        tp += len(matched_g)
        fn += len(g) - len(matched_g)
        fp += len(p) - len(matched_g)
        # carry matches for gts absent this frame too (CLEAR keeps memory)
        last_match.update(new_match)
    mota = 1.0 - (fn + fp + idsw) / max(n_gt_total, 1)
    motp = dist_sum / max(tp, 1)
    return {"MOTA": 100 * mota, "MOTP": 100 * motp, "IDSW": idsw,
            "FP": fp, "FN": fn, "TP": tp, "n_gt": n_gt_total}


def idf1(gt_ids: Sequence[np.ndarray], pred_ids: Sequence[np.ndarray],
         similarity: Sequence[np.ndarray],
         iou_thresh: float = 0.5) -> Dict[str, float]:
    """ID metrics: global trajectory-level bipartite matching (Ristani 2016).

    IDTP maximized over a one-to-one id mapping of per-frame co-occurrences
    with IoU >= thresh.
    """
    all_g = np.unique(np.concatenate([np.asarray(g, int).ravel() for g in gt_ids])
                      if any(len(g) for g in gt_ids) else np.zeros(0, int))
    all_p = np.unique(np.concatenate([np.asarray(p, int).ravel() for p in pred_ids])
                      if any(len(p) for p in pred_ids) else np.zeros(0, int))
    gm = {v: i for i, v in enumerate(all_g)}
    pm = {v: i for i, v in enumerate(all_p)}
    overlap = np.zeros((len(all_g), len(all_p)))
    n_gt = n_pr = 0
    for g, p, s in zip(gt_ids, pred_ids, similarity):
        g = np.asarray(g, int).ravel()
        p = np.asarray(p, int).ravel()
        s = np.asarray(s, float).reshape(len(g), len(p))
        n_gt += len(g)
        n_pr += len(p)
        ok = s >= iou_thresh
        for i in range(len(g)):
            for j in range(len(p)):
                if ok[i, j]:
                    overlap[gm[g[i]], pm[p[j]]] += 1
    idtp = 0.0
    if overlap.size:
        r, c = linear_sum_assignment(-overlap)
        idtp = overlap[r, c].sum()
    idfn = n_gt - idtp
    idfp = n_pr - idtp
    idf1_v = 2 * idtp / max(2 * idtp + idfn + idfp, 1e-12)
    idp = idtp / max(idtp + idfp, 1e-12)
    idr = idtp / max(idtp + idfn, 1e-12)
    return {"IDF1": 100 * idf1_v, "IDP": 100 * idp, "IDR": 100 * idr,
            "IDTP": idtp, "IDFN": idfn, "IDFP": idfp}


def pool_idf1(per_seq: Sequence[Dict[str, float]]) -> Dict[str, float]:
    """Combine per-sequence ID metrics by pooling raw counts (motmetrics
    semantics, `MOTR/util/evaluation.py:15-171`) — NOT by averaging the
    per-sequence ratios, which diverges on uneven sequence lengths."""
    idtp = sum(c["IDTP"] for c in per_seq)
    idfn = sum(c["IDFN"] for c in per_seq)
    idfp = sum(c["IDFP"] for c in per_seq)
    return {
        "IDF1": 100 * 2 * idtp / max(2 * idtp + idfn + idfp, 1e-12),
        "IDP": 100 * idtp / max(idtp + idfp, 1e-12),
        "IDR": 100 * idtp / max(idtp + idfn, 1e-12),
    }


def write_mot_txt(fh: TextIO, frame_idx: int, ids: np.ndarray,
                  boxes_xyxy: np.ndarray, conf: np.ndarray = None) -> None:
    """Append one frame in MOT-challenge format:
    frame,id,x1,y1,w,h,1,-1,-1,-1 (1-indexed frames). Unassigned rows
    (id < 0) are dropped, matching the reference writer
    (`MOTR/submit.py:415-416`); row-identity with it is pinned by
    tests/test_mot_challenge_e2e.py."""
    for k in range(len(ids)):
        if int(ids[k]) < 0:
            continue
        x1, y1, x2, y2 = boxes_xyxy[k]
        fh.write(f"{frame_idx + 1},{int(ids[k])},{x1:.2f},{y1:.2f},"
                 f"{x2 - x1:.2f},{y2 - y1:.2f},1,-1,-1,-1\n")
