"""End-to-end pipeline A/B on an on-disk MOT-challenge-layout fixture
(round-4 VERDICT item #6).

A synthetic dataset is written to the REAL MOT17 directory layout
(`images/train/<seq>/img1/*.png` + `gt/gt.txt` + `seqinfo.ini` — the tree
`MOTR/submit.py:381` / `MOTR/util/evaluation.py:126` consume), converted
through `data/mot_challenge.py`, and the FULL val orchestration (sequence
detection, state reset, per-sequence accumulation, HOTA, MOT-txt writing)
runs over it.  Reference-side oracles run the reference's OWN code on the
same data:

  * `_calculate_box_ious` (`models/MOTRtrack/val.py:515-553`) — the
    similarity function its HOTA accumulation feeds — extracted by AST
    (no torch import baggage) and compared per frame against our stored
    similarity matrices;
  * `HOTA().eval_sequence` (`ultralytics/utils/hota.py`) — fed a
    `data_hota` dict built with the reference validator's exact
    bookkeeping (`val.py:292-330,420-436`) from our collected buffers;
    count fields must agree exactly and the metric call must succeed
    (field-level equality is pinned separately in test_hota_oracle.py's
    restricted regime — the reference implementation is only
    well-defined there);
  * `Detector.write_results` (`MOTR/submit.py:410-424`) — the MOT-txt
    writer — extracted by AST and compared row-by-row against our
    `write_mot_txt` on identical tracker outputs.
"""

import ast
import os

import numpy as np
import pytest
import jax

from mo_yolo_tpu.data.mot_challenge import (convert_mot_to_yolo,
                                            find_sequences, parse_seqinfo,
                                            read_mot_gt)

SIZE = 96          # fixture frame size (square)
N_FRAMES = 6
N_SEQ = 2
N_OBJ = 3


def _extract_static(py_path: str, func_name: str):
    """Compile one function from a reference source file without importing
    the module (their modules drag in torch/cv2/motmetrics chains).
    Decorators (e.g. @staticmethod) are stripped; numpy is provided."""
    with open(py_path) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            node.decorator_list = []
            mod = ast.Module(body=[node], type_ignores=[])
            ns = {"np": np, "os": os}
            exec(compile(ast.fix_missing_locations(mod), py_path, "exec"), ns)
            return ns[func_name]
    raise AssertionError(f"{func_name} not found in {py_path}")


@pytest.fixture(scope="module")
def mot_fixture(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mot17"))
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from make_synth_mot import make_mot_fixture
    make_mot_fixture(root, n_seq=N_SEQ, size=SIZE, n_frames=N_FRAMES,
                     n_obj=N_OBJ, seed=3)
    return root


@pytest.fixture(scope="module")
def tiny():
    import jax.numpy as jnp
    from mo_yolo_tpu.models.graph import parse_model_yaml
    from mo_yolo_tpu.models.tracker import TrackerConfig, init_track_state
    from mo_yolo_tpu.models.tracking_model import TrackingModel
    spec = parse_model_yaml("tests/tiny_track.yaml")
    model = TrackingModel(spec=spec, tracker=TrackerConfig(n_slots=10),
                          nq=12, ndl=2, d_ffn=32, hd=32, num_denoising=4)
    state = init_track_state(1, 10, 32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), state,
                   train=False)
    return model, v


# ------------------------------------------------------------ ingestion


def test_mot_layout_roundtrip(mot_fixture, tmp_path):
    """gt.txt -> converted 6-col labels -> TrackDataset equals the
    original pixel-space ground truth."""
    seqs = find_sequences(mot_fixture, "train")
    assert len(seqs) == N_SEQ
    info = parse_seqinfo(seqs[0])
    assert info["imWidth"] == SIZE and info["seqLength"] == N_FRAMES

    yaml_path = convert_mot_to_yolo(mot_fixture, str(tmp_path / "yolo"))
    from mo_yolo_tpu.data.dataset import (TrackDataset, img2label_path,
                                          load_dataset_yaml,
                                          load_track_label)
    d = load_dataset_yaml(yaml_path)
    assert len(d["train"]) == N_SEQ * N_FRAMES
    # fixture default: last sequence doubles as the val split
    assert len(d["val"]) == N_FRAMES

    ds = TrackDataset(d["train"], imgsz=SIZE, max_gt=8, clip_len=1)
    assert len(ds.videos) == N_SEQ       # parent-dir video grouping

    gt = read_mot_gt(os.path.join(seqs[0], "gt", "gt.txt"))
    lab = load_track_label(img2label_path(d["train"][0]))   # frame 1, seq 1
    rows = gt[1]
    assert len(lab) == len(rows) == N_OBJ
    # normalized cxcywh -> pixel tlwh must reproduce gt.txt (fp32 exact
    # within txt round-trip precision); id column carried through
    got = np.stack([(lab[:, 1] - lab[:, 3] / 2) * SIZE,
                    (lab[:, 2] - lab[:, 4] / 2) * SIZE,
                    lab[:, 3] * SIZE, lab[:, 4] * SIZE], 1)
    np.testing.assert_allclose(got, rows[:, 2:6], atol=2e-3)
    np.testing.assert_array_equal(lab[:, 5].astype(int),
                                  rows[:, 1].astype(int))


def test_flat_naming_matches_reference_convention(mot_fixture, tmp_path):
    """flat=True reproduces the filename contract the reference validator
    parses: `im_file[-15:-4]` = VVVV_FFFFFF, video id = first 4 chars
    (`models/MOTRtrack/val.py:255,277`)."""
    yaml_path = convert_mot_to_yolo(mot_fixture, str(tmp_path / "flat"),
                                    flat=True)
    from mo_yolo_tpu.data.dataset import load_dataset_yaml
    files = load_dataset_yaml(yaml_path)["train"]
    assert len(files) == N_SEQ * N_FRAMES
    stems = [f[-15:-4] for f in files]
    assert all(len(s) == 11 and s[4] == "_" for s in stems)
    assert sorted({s[:4] for s in stems}) == ["0000", "0001"]
    # frames sort in temporal order within a video id
    assert stems == sorted(stems)


# ----------------------------------------------------- MOT txt writing


def test_mot_txt_rows_match_reference_writer(tmp_path):
    """Our `write_mot_txt` and the reference `Detector.write_results`
    (`MOTR/submit.py:410-424`) produce row-identical MOT files on the
    same tracker outputs (field-exact after parse; the reference prints
    raw float repr where we fix 2 decimals)."""
    ref_write = _extract_static("/root/reference/MOTR/submit.py",
                                "write_results")
    from mo_yolo_tpu.metrics.mot import write_mot_txt

    rng = np.random.default_rng(0)
    ours_path = tmp_path / "ours.txt"
    ref_path = tmp_path / "ref.txt"
    with open(ours_path, "w") as fh:
        for t in range(4):
            n = int(rng.integers(0, 5))
            boxes = np.round(rng.uniform(0, 500, (n, 4)).astype(np.float64), 2)
            boxes[:, 2:] += boxes[:, :2]       # x1y1x2y2
            ids = rng.integers(-1, 30, n)      # includes the -1 drop case
            write_mot_txt(fh, t, ids, boxes)
            ref_write(str(ref_path), t + 1, boxes, ids)

    def parse(p):
        rows = []
        for line in open(p):
            f = line.strip().split(",")
            rows.append([float(v) for v in f])
        return np.asarray(rows)

    a, b = parse(ours_path), parse(ref_path)
    assert a.shape == b.shape and a.shape[1] == 10
    np.testing.assert_allclose(a, b, atol=1e-9)
    # both drop id < 0 rows (reference submit.py:415-416)
    assert (a[:, 1] >= 0).all()


# ------------------------------------------------- full val() pipeline


def test_val_orchestration_on_mot_fixture(mot_fixture, tiny, tmp_path):
    """Full val over the converted MOT tree: sequence detection + state
    reset + per-sequence accumulation, with the reference's own
    similarity function and HOTA accumulation bookkeeping replayed on
    the collected buffers."""
    model, v = tiny
    yaml_path = convert_mot_to_yolo(mot_fixture, str(tmp_path / "yolo"))
    from mo_yolo_tpu.data.dataset import load_dataset_yaml
    files = load_dataset_yaml(yaml_path)["train"]

    from mo_yolo_tpu.engine.validator import TrackValidator
    val = TrackValidator(model, v, imgsz=64, conf=0.0, collect=True)
    out = val(files, max_gt=8)

    # ---- orchestration: one buffer per sequence, full frame coverage,
    # state reset at each boundary (ids may repeat across sequences
    # because the allocator restarts — they must NOT continue)
    assert len(val.sequences) == N_SEQ
    for _, gt_ids, pr_ids, sims, gt_boxes, pr_boxes in val.sequences:
        assert len(gt_ids) == N_FRAMES
        assert all(len(g) == N_OBJ for g in gt_ids)
        assert all(s.shape == (len(g), len(p)) for g, p, s in
                   zip(gt_ids, pr_ids, sims))
    for k in ("HOTA", "DetA", "AssA", "MOTA", "IDF1", "mAP50"):
        assert k in out and np.isfinite(out[k])

    # ---- reference similarity oracle: their _calculate_box_ious on the
    # same (square-fixture) boxes equals our stored sim matrices
    ref_ious = _extract_static(
        "/root/reference/ultralytics/models/MOTRtrack/val.py",
        "_calculate_box_ious")
    for _, gt_ids, pr_ids, sims, gt_boxes, pr_boxes in val.sequences:
        for g, p, s in zip(gt_boxes, pr_boxes, sims):
            if len(g) and len(p):
                want = ref_ious(g.astype(np.float64) * SIZE,
                                p.astype(np.float64) * SIZE,
                                box_format="x0y0x1y1")
                np.testing.assert_allclose(s, want, atol=1e-5)

    # ---- reference accumulation bookkeeping (val.py:292-330): build the
    # exact data_hota dict their per-sequence flush constructs and run
    # the reference HOTA end to end on it
    import sys
    sys.path.insert(0, "/root/repo/tests")
    import torch_ref
    torch_ref._install_stubs()
    sys.path.insert(0, "/root/reference")
    from ultralytics.utils.hota import HOTA

    from mo_yolo_tpu.metrics import hota as ours_hota
    for _, gt_ids, pr_ids, sims, gt_boxes, pr_boxes in val.sequences:
        # dense-remap both id streams (metric-invariant; their impl
        # indexes count arrays by raw id so it needs 0..n-1 — the remap
        # their val.py computes at val.py:455-472 but leaves disabled)
        def dense(idss):
            uniq = np.unique(np.concatenate([i for i in idss]) if
                             any(len(i) for i in idss) else np.array([], int))
            m = {int(u): k for k, u in enumerate(uniq)}
            return [np.array([m[int(x)] for x in i], int) for i in idss], \
                len(uniq)
        g_remap, n_gt_ids = dense(gt_ids)
        p_remap, n_pr_ids = dense(pr_ids)
        data = {
            "num_timesteps": len(gt_ids),
            "num_gt_dets": int(sum(len(i) for i in gt_ids)),
            "num_tracker_dets": int(sum(len(i) for i in pr_ids)),
            "num_gt_ids": n_gt_ids,
            "num_tracker_ids": n_pr_ids,
            # the reference feeds gt ids as (n,1) COLUMN arrays (its
            # val.py batch['track_id'] layout; hota.py does `.T[0]`)
            "gt_ids": [g.reshape(-1, 1) for g in g_remap],
            "tracker_ids": p_remap,
            "similarity_scores": [s.astype(np.float64) for s in sims],
        }
        ref = HOTA().eval_sequence(data)
        got = ours_hota.eval_sequence(g_remap, p_remap, sims)
        # count bookkeeping must agree exactly across implementations
        np.testing.assert_array_equal(
            got["HOTA_TP"] + got["HOTA_FN"],
            np.full(19, data["num_gt_dets"]))
        assert ref["HOTA"].shape == got["HOTA"].shape == (19,)
        # detection counts: the reference's count pass is only
        # well-defined in the restricted oracle regime
        # (test_hota_oracle.py); here we pin that its TP+FN and TP+FP
        # sums — which do not touch the buggy per-id paths — agree
        np.testing.assert_array_equal(ref["HOTA_TP"] + ref["HOTA_FN"],
                                      got["HOTA_TP"] + got["HOTA_FN"])
        np.testing.assert_array_equal(ref["HOTA_TP"] + ref["HOTA_FP"],
                                      got["HOTA_TP"] + got["HOTA_FP"])
        np.testing.assert_array_equal(ref["HOTA_TP"], got["HOTA_TP"])


def test_facade_val_and_mot_txt_over_fixture(mot_fixture, tiny, tmp_path):
    """The user-level path a reference user migrates to: facade val() on
    the converted dataset yaml + streaming predict with save_mot over a
    raw MOT sequence directory."""
    model, v = tiny
    yaml_path = convert_mot_to_yolo(mot_fixture, str(tmp_path / "yolo"))

    from mo_yolo_tpu.api import MOTRTrack
    m = MOTRTrack.__new__(MOTRTrack)        # wrap the shared tiny model
    m.model, m.variables, m.imgsz = model, v, 64
    m.names = {}                  # .callbacks is a lazy property
    out = m.val(yaml_path, conf=0.0, max_gt=8)
    assert np.isfinite(out["HOTA"])

    # streaming predict over the raw MOT img1 dir writes MOT txt rows
    seq = find_sequences(mot_fixture, "train")[0]
    from mo_yolo_tpu.engine.predictor import TrackPredictor
    pred = TrackPredictor(model, v, imgsz=64, conf=0.0)
    mot_txt = tmp_path / "MOT17-01.txt"
    results = list(pred.stream(os.path.join(seq, "img1"),
                               save_mot=str(mot_txt)))
    assert len(results) == N_FRAMES
    rows = [l.split(",") for l in open(mot_txt) if l.strip()]
    if rows:                                 # random-init may emit few
        assert all(len(r) == 10 for r in rows)
        frames = sorted({int(r[0]) for r in rows})
        assert frames[0] >= 1 and frames[-1] <= N_FRAMES
