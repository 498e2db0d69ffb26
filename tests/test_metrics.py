"""Metric unit tests against hand-computed toy sequences
(SURVEY.md §4 test-pyramid item (5))."""

import numpy as np

from mo_yolo_tpu.metrics.hota import eval_sequence, summarize
from mo_yolo_tpu.metrics.mot import clear_mot, idf1, pool_idf1, write_mot_txt
from mo_yolo_tpu.metrics.detection import DetMetrics, box_iou_np


def _perfect_seq(T=5, n=3):
    gt_ids = [np.arange(n) for _ in range(T)]
    pred_ids = [np.arange(n) + 100 for _ in range(T)]
    sim = [np.eye(n) for _ in range(T)]
    return gt_ids, pred_ids, sim


def test_hota_perfect_tracking():
    r = eval_sequence(*_perfect_seq())
    s = summarize([r])
    assert abs(s["HOTA"] - 100.0) < 1e-6
    assert abs(s["DetA"] - 100.0) < 1e-6
    assert abs(s["AssA"] - 100.0) < 1e-6


def test_hota_id_switch_hurts_assa_not_deta():
    T, n = 6, 1
    gt_ids = [np.array([0])] * T
    # tracker switches identity halfway: det perfect, association broken
    pred_ids = [np.array([10])] * (T // 2) + [np.array([20])] * (T // 2)
    sim = [np.ones((1, 1))] * T
    s = summarize([eval_sequence(gt_ids, pred_ids, sim)])
    assert abs(s["DetA"] - 100.0) < 1e-6
    assert s["AssA"] < 60.0
    assert s["HOTA"] < 80.0


def test_hota_missed_detections():
    T = 4
    gt_ids = [np.array([0, 1])] * T
    pred_ids = [np.array([5])] * T  # only tracks one object
    sim = [np.array([[1.0], [0.0]])] * T
    s = summarize([eval_sequence(gt_ids, pred_ids, sim)])
    # DetA = TP/(TP+FN+FP) = 4/(4+4+0) = 0.5
    assert abs(s["DetA"] - 50.0) < 1e-4


def test_clear_mot_perfect_and_switch():
    g, p, s = _perfect_seq()
    r = clear_mot(g, p, s)
    assert r["MOTA"] == 100.0 and r["IDSW"] == 0
    # identity switch in the middle
    T = 6
    gt_ids = [np.array([0])] * T
    pred_ids = [np.array([10])] * 3 + [np.array([20])] * 3
    sim = [np.ones((1, 1))] * T
    r = clear_mot(gt_ids, pred_ids, sim)
    assert r["IDSW"] == 1
    assert abs(r["MOTA"] - 100 * (1 - 1 / 6)) < 1e-6


def test_idf1_switch():
    T = 6
    gt_ids = [np.array([0])] * T
    pred_ids = [np.array([10])] * 3 + [np.array([20])] * 3
    sim = [np.ones((1, 1))] * T
    r = idf1(gt_ids, pred_ids, sim)
    # best mapping keeps 3 of 6 frames -> IDTP=3, IDF1 = 2*3/(2*3+3+3) = 0.5
    assert abs(r["IDF1"] - 50.0) < 1e-6


def test_idf1_pooled_uneven_sequences():
    """Pooled IDF1 must combine raw ID counts across sequences, not average
    the per-sequence ratios (motmetrics semantics).

    Seq A: 20 frames, perfect single track -> IDTP=20, IDF1_A = 100.
    Seq B: 2 frames, 1 GT, 1 wrong-box pred per frame (IoU 0) -> IDTP=0,
    IDFN=2, IDFP=2, IDF1_B = 0.
    Pooled: 2*20 / (2*20 + 2 + 2) = 40/44 = 90.909..., whereas the naive
    per-sequence mean would report 50.
    """
    seq_a = idf1([np.array([0])] * 20, [np.array([7])] * 20,
                 [np.ones((1, 1))] * 20)
    seq_b = idf1([np.array([0])] * 2, [np.array([9])] * 2,
                 [np.zeros((1, 1))] * 2)
    assert abs(seq_a["IDF1"] - 100.0) < 1e-9
    assert abs(seq_b["IDF1"] - 0.0) < 1e-9
    pooled = pool_idf1([seq_a, seq_b])
    assert abs(pooled["IDF1"] - 100 * 40 / 44) < 1e-9
    assert abs(pooled["IDP"] - 100 * 20 / 22) < 1e-9
    assert abs(pooled["IDR"] - 100 * 20 / 22) < 1e-9


def test_detmetrics_perfect():
    m = DetMetrics(nc=2)
    boxes = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float)
    cls = np.array([0, 1])
    m.update(boxes, np.array([0.9, 0.8]), cls, boxes, cls)
    out = m.compute()
    assert out["mAP50"] > 99.0
    assert out["mAP50-95"] > 99.0


def test_detmetrics_false_positive_lowers_ap():
    m = DetMetrics(nc=1)
    gt = np.array([[10, 10, 50, 50]], float)
    preds = np.array([[10, 10, 50, 50], [200, 200, 240, 240]], float)
    m.update(preds, np.array([0.5, 0.9]), np.zeros(2), gt, np.zeros(1))
    out = m.compute()
    assert out["mAP50"] < 99.0


def test_mot_writer(tmp_path):
    f = tmp_path / "seq.txt"
    with open(f, "w") as fh:
        write_mot_txt(fh, 0, np.array([3]), np.array([[10.0, 20.0, 30.0, 60.0]]))
    line = f.read_text().strip()
    assert line == "1,3,10.00,20.00,20.00,40.00,1,-1,-1,-1"


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], float)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], float)
    iou = box_iou_np(a, b)
    assert abs(iou[0, 0] - 1.0) < 1e-9
    assert abs(iou[0, 1] - 25 / 175) < 1e-9


def test_confusion_matrix():
    from mo_yolo_tpu.metrics.detection import ConfusionMatrix

    cm = ConfusionMatrix(nc=2, conf=0.25, iou_thresh=0.45)
    gt = np.array([[10, 10, 50, 50], [60, 60, 90, 90]], float)
    gt_cls = np.array([0, 1])
    # one correct, one misclassified, one FP
    preds = np.array([[10, 10, 50, 50], [60, 60, 90, 90],
                      [200, 200, 230, 230]], float)
    cm.update(preds, np.array([0.9, 0.9, 0.9]), np.array([0, 0, 1]),
              gt, gt_cls)
    assert cm.matrix[0, 0] == 1      # correct class 0
    assert cm.matrix[0, 1] == 1      # class 1 predicted as 0
    assert cm.matrix[1, 2] == 1      # FP vs background
    assert cm.matrix.sum() == 3


def test_dedup_for_map_duplicate_track_detect_predictions():
    """Round-2 VERDICT weak #1 regression: the stream step emits a tracked
    object twice (track slot + detect query). When the duplicate scores
    INTERLEAVE with the primaries (dup_i outranks primary_{i+1} — the
    realistic case, since track-slot and detect-query confidences come
    from different heads), each duplicate is an FP ranked before full
    recall, so precision at recall k/n is k/(2k-1) and AP50 collapses
    (~0.62 for n=8) while the deduped set scores 1.0. Note: duplicates
    ranked strictly AFTER full recall do NOT reduce interpolated AP —
    that's correct PR behavior, not a dedup failure."""
    import numpy as np
    from mo_yolo_tpu.engine.validator import dedup_for_map
    from mo_yolo_tpu.metrics.detection import DetMetrics

    n = 8
    gt = np.stack([np.array([10 + 40 * i, 10, 30 + 40 * i, 30], float)
                   for i in range(n)])
    gt_cls = np.zeros(n, int)
    preds, scores = [], []
    for i in range(n):
        preds.append(gt[i])                                # track slot
        scores.append(0.9 - 0.05 * (2 * i))
        preds.append(gt[i] + np.array([0.5, 0.0, 0.5, 0.0]))  # detect query
        scores.append(0.9 - 0.05 * (2 * i + 1))
    pred = np.stack(preds)
    scores = np.array(scores)
    cls = np.zeros(2 * n, int)

    raw = DetMetrics(1)
    raw.update(pred, scores, cls, gt, gt_cls)
    ap_raw = raw.compute()["mAP50"]          # percent scale

    keep = dedup_for_map(pred, scores, cls)
    assert sorted(keep.tolist()) == list(range(0, 2 * n, 2))
    ded = DetMetrics(1)
    ded.update(pred[keep], scores[keep], cls[keep], gt, gt_cls)
    ap_ded = ded.compute()["mAP50"]

    assert ap_ded > 99.0, ap_ded
    assert ap_raw < 80.0, ap_raw

    # different classes must NOT suppress each other
    cls2 = np.tile(np.array([0, 1]), n)
    keep2 = dedup_for_map(pred, scores, cls2)
    assert len(keep2) == 2 * n
