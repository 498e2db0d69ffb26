"""HOTA family metrics (HOTA / DetA / AssA / LocA / OWTA).

Host-side numpy implementation of the HOTA algorithm (Luiten et al., IJCV
2020), the same metric the reference vendors from TrackEval
(`ultralytics/utils/hota.py`): two-pass evaluation with global alignment
scores, per-timestep Hungarian on alignment*similarity, over 19 alpha
thresholds 0.05..0.95.

Input format per sequence (mirrors the reference validator's accumulation,
`models/MOTRtrack/val.py:288-324`):
  gt_ids:   list over frames of int arrays (GT identities present)
  pred_ids: list over frames of int arrays (tracker identities present)
  similarity: list over frames of [n_gt, n_pred] IoU matrices
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
from scipy.optimize import linear_sum_assignment

ALPHAS = np.arange(0.05, 0.99, 0.05)  # 19 thresholds


def eval_sequence(gt_ids: Sequence[np.ndarray],
                  pred_ids: Sequence[np.ndarray],
                  similarity: Sequence[np.ndarray]) -> Dict[str, np.ndarray]:
    """Compute per-alpha HOTA fields for one sequence.

    Returns dict of arrays [n_alpha]: HOTA, DetA, AssA, LocA, OWTA and the
    raw accumulators (HOTA_TP/FN/FP, AssRe, AssPr) for cross-sequence
    combination.
    """
    n_a = len(ALPHAS)
    # id re-mapping to dense indices
    all_gt = np.unique(np.concatenate([np.asarray(g, int).ravel() for g in gt_ids])
                       if any(len(g) for g in gt_ids) else np.zeros(0, int))
    all_pr = np.unique(np.concatenate([np.asarray(p, int).ravel() for p in pred_ids])
                       if any(len(p) for p in pred_ids) else np.zeros(0, int))
    n_g, n_p = len(all_gt), len(all_pr)
    g_map = {v: i for i, v in enumerate(all_gt)}
    p_map = {v: i for i, v in enumerate(all_pr)}

    res = {k: np.zeros(n_a) for k in
           ("HOTA_TP", "HOTA_FN", "HOTA_FP", "LocA_sum")}
    if n_g == 0 and n_p == 0:
        out = {k: np.zeros(n_a) for k in
               ("HOTA", "DetA", "AssA", "LocA", "OWTA", "AssRe", "AssPr")}
        out.update(res)
        return out

    # pass 1: potential matches -> global alignment scores
    pot = np.zeros((n_g, n_p))
    g_cnt = np.zeros(n_g)
    p_cnt = np.zeros(n_p)
    for g, p, s in zip(gt_ids, pred_ids, similarity):
        gi = np.array([g_map[v] for v in np.asarray(g, int).ravel()], int)
        pi = np.array([p_map[v] for v in np.asarray(p, int).ravel()], int)
        s = np.asarray(s, float).reshape(len(gi), len(pi))
        if len(gi) and len(pi):
            denom = s.sum(0)[None, :] + s.sum(1)[:, None] - s
            sim_iou = np.zeros_like(s)
            nz = denom > 0 + 1e-12
            sim_iou[nz] = s[nz] / denom[nz]
            pot[np.ix_(gi, pi)] += sim_iou
        g_cnt[gi] += 1
        p_cnt[pi] += 1
    align = pot / np.maximum(g_cnt[:, None] + p_cnt[None, :] - pot, 1e-12)

    # pass 2: per-timestep matching, per-alpha accumulation
    match_cnt = np.zeros((n_a, n_g, n_p))
    for g, p, s in zip(gt_ids, pred_ids, similarity):
        gi = np.array([g_map[v] for v in np.asarray(g, int).ravel()], int)
        pi = np.array([p_map[v] for v in np.asarray(p, int).ravel()], int)
        s = np.asarray(s, float).reshape(len(gi), len(pi))
        if len(gi) and len(pi):
            score = align[np.ix_(gi, pi)] * s
            r, c = linear_sum_assignment(-score)
            for ai, alpha in enumerate(ALPHAS):
                ok = s[r, c] >= alpha - np.finfo(float).eps
                rm, cm = r[ok], c[ok]
                res["HOTA_TP"][ai] += len(rm)
                res["HOTA_FN"][ai] += len(gi) - len(rm)
                res["HOTA_FP"][ai] += len(pi) - len(rm)
                res["LocA_sum"][ai] += s[rm, cm].sum()
                match_cnt[ai][gi[rm], pi[cm]] += 1
        else:
            res["HOTA_FN"] += len(gi)
            res["HOTA_FP"] += len(pi)

    # association scores per alpha
    ass_a = np.zeros(n_a)
    ass_re = np.zeros(n_a)
    ass_pr = np.zeros(n_a)
    for ai in range(n_a):
        m = match_cnt[ai]
        union = np.maximum(g_cnt[:, None] + p_cnt[None, :] - m, 1e-12)
        a = m / union
        tp = max(res["HOTA_TP"][ai], 1e-12)
        ass_a[ai] = (a * m).sum() / tp
        ass_re[ai] = (m * (m / np.maximum(g_cnt[:, None], 1e-12))).sum() / tp
        ass_pr[ai] = (m * (m / np.maximum(p_cnt[None, :], 1e-12))).sum() / tp

    det_a = res["HOTA_TP"] / np.maximum(
        res["HOTA_TP"] + res["HOTA_FN"] + res["HOTA_FP"], 1e-12)
    loc_a = np.where(res["HOTA_TP"] > 0,
                     res["LocA_sum"] / np.maximum(res["HOTA_TP"], 1e-12), 1.0)
    hota = np.sqrt(det_a * ass_a)
    owta = np.sqrt(ass_a * res["HOTA_TP"] /
                   np.maximum(res["HOTA_TP"] + res["HOTA_FN"], 1e-12))
    out = {"HOTA": hota, "DetA": det_a, "AssA": ass_a, "LocA": loc_a,
           "OWTA": owta, "AssRe": ass_re, "AssPr": ass_pr}
    out.update(res)
    return out


def summarize(seq_results: List[Dict[str, np.ndarray]]) -> Dict[str, float]:
    """Combine per-sequence results (TP-weighted, as TrackEval does) and
    average over alphas -> final scalar metrics (percent)."""
    if not seq_results:
        return {k: 0.0 for k in ("HOTA", "DetA", "AssA", "LocA", "OWTA")}
    tp = sum(r["HOTA_TP"] for r in seq_results)
    fn = sum(r["HOTA_FN"] for r in seq_results)
    fp = sum(r["HOTA_FP"] for r in seq_results)
    loc = sum(r["LocA_sum"] for r in seq_results)
    det_a = tp / np.maximum(tp + fn + fp, 1e-12)
    ass_a = sum(r["AssA"] * r["HOTA_TP"] for r in seq_results) / np.maximum(tp, 1e-12)
    loc_a = np.where(tp > 0, loc / np.maximum(tp, 1e-12), 1.0)
    hota = np.sqrt(det_a * ass_a)
    owta = np.sqrt(ass_a * tp / np.maximum(tp + fn, 1e-12))
    return {
        "HOTA": 100 * float(hota.mean()),
        "DetA": 100 * float(det_a.mean()),
        "AssA": 100 * float(ass_a.mean()),
        "LocA": 100 * float(loc_a.mean()),
        "OWTA": 100 * float(owta.mean()),
    }
