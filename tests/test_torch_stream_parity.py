"""Composed multi-frame streaming A/B vs the torch reference
(round-4 VERDICT item #3).

Every *component* of the tracking stack has a numeric-parity test
(decoder forward, QIM refresh, runtime-tracker lifecycle, losses); this
file drives the COMPOSED loop — decoder -> RuntimeTracker -> carried
state -> next frame's decoder — side by side with the real reference
modules on the same imported weights and the same rendered video, and
compares the emitted per-frame track rows.

The reference RELEASE cannot run this loop itself:
  * `MOTRTrack.forward` ignores its `is_first` argument and reads
    `self.is_first`, which nothing in the tree ever sets to False
    (`head.py:199`, grep: no `.is_first = False` anywhere) — the
    shipped eval path re-initialises track state every frame;
  * the carried `ref_pts` are written in sigmoid space
    (`head.py:452-455`: `ref_pts_all[-1]` = `dec_bboxes[-1]`) but
    consumed as logit space (`head.py:1056` feeds them straight into
    `refer_bbox`, which `transformer.py:693` sigmoids again).
So the torch side here composes the INTENDED loop out of the
reference's own modules, exactly as `MOTR/models/motr.py:580-640` does:
  * the real `MYDecoder` forward with `is_first=False`,
    `track_ref_pts` in logit space (`MOTR/models/qim.py:300`:
    ref = inverse_sigmoid(pred_boxes)), carried `pred_logits` as
    `pre_class`, carried `query_pos`;
  * the real `RuntimeTrackerBase.update` for the ID lifecycle
    (births, expiry, duplicate suppression, renumbering);
  * carried state = the active subset it returns (MOTR
    `qim.py:_select_active_tracks` eval semantics).
The QIM refresh is intentionally absent from both loops' *effective*
compute: in the release the decoder's track-query content comes from
the class-embedding table (`head.py:896-899`), not from the refreshed
output embedding, and eval QIM runs with update_query_pos=False — so
its outputs feed nothing (documented in `models/tracker.py`; the QIM
math itself is pinned by test_torch_qim_tracker_parity).

This is the seam where silent divergence would hide: a wrong carried
query_pos / ref-point space or a mis-threaded slot compaction would
pass every single-frame component test but drift here within frames.
"""

from __future__ import annotations

import pytest

# heavy tier (round-4 VERDICT weak #7): multi-minute reference-torch
# comparison; run with --runheavy / --runall
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.torch_ref import build_tracking_model, load_reference  # noqa: E402

N_FRAMES = 10
IMGSZ = 160
N_SLOTS = 176      # our fixed track-slot count (>= max simultaneous tracks:
                   # with an untrained net every detect query births every
                   # frame, so tracks grow ~nq per frame — which is exactly
                   # the regime that stresses the slot compaction / carry)
SCORE_T = 0.45     # birth threshold; the fixture asserts every decision
FILTER_T = 0.40    # sits far (>2e-3) from these, so no knife edges
MISS_TOL = 15      # > N_FRAMES: expiry can never fire, so the reference's
                   # known disappear-time-never-resets bug (component test
                   # doc) cannot desynchronise the composed comparison


@pytest.fixture(scope="module")
def ref_model():
    """(reference model, nq) with a separated score landscape.

    An untrained model's enc/dec scores cluster within ~1e-3 of each
    other, so both the top-k query selection and any tracker threshold
    would sit knife-edge on float noise. Recipe:
      * textured video (16-px cells, below) makes per-anchor features
        distinct at the stride-8/16/32 receptive fields;
      * ~30 train-mode backbone passes on the video domain converge the
        BN running stats (a single random pass leaves eval features
        collapsed to ~0.001 absmean — no contrast anywhere);
      * perturbing every head param at sigma 0.05 separates anchors, and
        the score heads harder (sigma 0.35) spreads per-query logits;
      * nq is chosen AT THE WIDEST GAP of the sorted dense enc scores
        (ranks 12..48) so the top-k cut is deterministic across
        frameworks (cross-framework enc-score noise is ~1e-5; the
        reference default nq=300 would select 300 of only 525 anchors
        at 160^2 — every selection a tie);
      * the final score-head biases are recentered by the mean max-class
        logit so sigmoid maps the spread across (0.05, 0.95) and tracker
        thresholds can sit in wide gaps.
    """
    tm = build_tracking_model(
        "/root/reference/ultralytics/cfg/models/v8/yolo_track.yaml")
    head = tm.model[-1]
    torch.manual_seed(7)
    with torch.no_grad():
        for name, p in head.named_parameters():
            p.add_(torch.randn_like(p) * 0.05)
        g = torch.Generator().manual_seed(23)
        for name, p in head.named_parameters():
            if "score_head" in name:
                p.add_(torch.randn(p.shape, generator=g) * 0.35)
    video = _render_video(8)
    tm.train()
    with torch.no_grad():
        for it in range(30):
            _backbone_feats(tm, _to_torch(video[it % 8:it % 8 + 1]))
    tm.eval()

    # pick nq at the widest sorted-dense-score gap (deterministic top-k)
    dense = {}
    h = head.decoder.enc_score_head.register_forward_hook(
        lambda m, i, o: dense.__setitem__(
            "d", o.detach()[0].max(-1).values.numpy().copy()))
    with torch.no_grad():
        feats = _backbone_feats(tm, _to_torch(video[0:1]))
        head.decoder(feats, is_first=True)
    h.remove()
    dsort = np.sort(dense["d"])[::-1]
    gaps = -np.diff(dsort)[11:48]          # cut candidates: ranks 12..48
    nq = int(np.argmax(gaps)) + 12
    head.decoder.num_queries = nq

    # recenter: frame-0 mean max-class dec logit -> 0
    with torch.no_grad():
        x = head.decoder(feats, is_first=True)
        logits = x[1][-1][0]                       # [nq, nc]
        mu = float(logits.max(-1).values.mean())
        for hd in [head.decoder.enc_score_head] + \
                list(head.decoder.dec_score_head):
            lin = hd if not hasattr(hd, "layers") else hd.layers[-1]
            if getattr(lin, "bias", None) is not None:
                lin.bias.add_(-mu)
    return tm, nq


def _render_video(n, size=IMGSZ, return_boxes=False):
    """Deterministic moving-blocks video over a TEXTURED background,
    [n, size, size, 3] f32 in [0,1]. The static texture makes per-anchor
    encoder features distinct so top-k query selection is not a tie.
    With return_boxes=True also returns per-frame GT [n, 4, 4] cxcywh
    normalized (track id = object index)."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    grad = np.stack([xx, yy, xx * yy], -1)
    # COARSE texture (16-px cells): per-pixel noise would be averaged out
    # by the stride-8/16/32 receptive fields; anchor-scale structure is
    # what makes per-anchor encoder features (hence top-k) distinct
    cell = 16
    coarse = rng.uniform(0.0, 1.0, (size // cell, size // cell, 3))
    tex = np.kron(coarse, np.ones((cell, cell, 1))).astype(np.float32)
    bg = 0.6 * tex + 0.4 * grad
    objs = []
    for _ in range(4):
        s = int(rng.uniform(0.15, 0.3) * size)
        color = rng.uniform(0.0, 1.0, 3).astype(np.float32)
        x, y = rng.uniform(s, size - s, 2)
        vx, vy = rng.uniform(-3, 3, 2)
        objs.append([x, y, vx, vy, s, color])
    out = np.empty((n, size, size, 3), np.float32)
    gt = np.empty((n, len(objs), 4), np.float32)
    for t in range(n):
        fr = bg.copy()
        for j, o in enumerate(objs):
            x, y, vx, vy, s, color = o
            o[0] = np.clip(x + vx, s / 2, size - s / 2)
            o[1] = np.clip(y + vy, s / 2, size - s / 2)
            x1, y1 = int(o[0] - s / 2), int(o[1] - s / 2)
            fr[y1:y1 + s, x1:x1 + s] = color
            gt[t, j] = ((x1 + s / 2) / size, (y1 + s / 2) / size,
                        s / size, s / size)
        out[t] = fr
    return (out, gt) if return_boxes else out


def _to_torch(frames_np):
    return torch.from_numpy(
        np.ascontiguousarray(frames_np.transpose(0, 3, 1, 2)))


def _backbone_feats(tm, timg):
    """Run the reference backbone/neck (everything before the head) and
    return the head's input feature list (the `nn/tasks.py:500-513`
    loop)."""
    head = tm.model[-1]
    y, x = [], timg
    for mod in tm.model[:-1]:
        if mod.f != -1:
            x = y[mod.f] if isinstance(mod.f, int) else \
                [x if j == -1 else y[j] for j in mod.f]
        x = mod(x)
        y.append(x if mod.i in tm.save else None)
    return [y[j] for j in head.f]


def _run_reference(tm, video, score_thresh, filter_score_thresh):
    """Intended-semantics composed loop from reference components (see
    module docstring). Returns per-frame rows
    [(obj_id, box cxcywh normalized, score), ...]."""
    ns = load_reference()
    from MOTR.models.structures import Instances
    from MOTR.util.misc import inverse_sigmoid

    head = tm.model[-1]
    dec = head.decoder
    tracker = ns.head.RuntimeTrackerBase(
        score_thresh=score_thresh, filter_score_thresh=filter_score_thresh,
        miss_tolerance=MISS_TOL)
    # duplicate suppression OFF on both sides for the composed A/B: the
    # dedup decision itself is component-pinned (test_torch_qim_tracker_
    # parity), but an untrained net's drifting twin boxes cross the 0.8
    # IoU boundary on different frames at f32 noise, which would cascade
    # a knife-edge decision into the comparison. Threading parity is what
    # this test isolates.
    tracker._filter_tracks = lambda inst: torch.ones(
        len(inst), dtype=torch.bool)
    nq = dec.num_queries

    # capture the exact query_pos the decoder built (carried || posemb of
    # the detect proposals) so the carry uses the reference's own values
    capd = {}
    orig_gdi = dec._get_decoder_input

    def gdi(*a, **k):
        out = orig_gdi(*a, **k)
        capd["query_pos"] = out[5].detach()
        return out

    dec._get_decoder_input = gdi
    carried = None   # Instances of active tracks (combined order)
    frames = []
    try:
        with torch.no_grad():
            for t in range(len(video)):
                feats = _backbone_feats(tm, _to_torch(video[t:t + 1]))
                K = 0 if carried is None else len(carried)
                if K == 0:
                    x = dec(feats, is_first=True)
                else:
                    x = dec(feats, track_ref_pts=carried.ref_pts,
                            is_first=False,
                            pre_class=carried.pred_logits,
                            track_query_pos=carried.query_pos)
                dec_bboxes, dec_scores = x[0], x[1]
                boxes = dec_bboxes[-1][0]            # [K+nq, 4] sigmoid
                logits = dec_scores[-1][0]           # [K+nq, nc]
                scores = logits.sigmoid().max(-1).values
                obj = torch.full((K + nq, 1), -1, dtype=torch.long)
                dis = torch.zeros(K + nq, dtype=torch.long)
                if K:
                    obj[:K] = carried.obj_idxes.reshape(K, 1)
                    dis[:K] = carried.disappear_time
                inst = Instances((1, 1))
                inst.pred_boxes = boxes
                inst.scores = scores
                inst.obj_idxes = obj
                inst.disappear_time = dis
                inst.pred_logits = logits
                inst.query_pos = capd["query_pos"][0]

                act = tracker.update(inst)
                keep = (act.obj_idxes.reshape(-1) >= 0)
                act = act[keep] if bool(keep.any()) else act[:0]

                frames.append([
                    (int(o), b.numpy().astype(float).copy(), float(s))
                    for o, b, s in zip(act.obj_idxes.reshape(-1),
                                       act.pred_boxes, act.scores)])
                # intended carry: logit-space ref points of the new boxes
                act.ref_pts = inverse_sigmoid(act.pred_boxes.detach())
                carried = act
    finally:
        dec._get_decoder_input = orig_gdi
    return frames


def _run_ours(sd, video, score_thresh, filter_score_thresh, nq):
    from mo_yolo_tpu.models.tracker import (
        TrackerConfig, init_track_state, unpack_outputs)
    from mo_yolo_tpu.models.tracking_model import (
        build_tracking_model as build_ours, init_variables)
    from mo_yolo_tpu.utils.checkpoint import apply_torch_state_dict

    cfg = TrackerConfig(n_slots=N_SLOTS, score_thresh=score_thresh,
                        filter_score_thresh=filter_score_thresh,
                        miss_tolerance=MISS_TOL,
                        dup_iou_thresh=1.01)   # dedup off (see _run_reference)
    model = build_ours("mo_yolo_tpu/cfg/models/yolo_track.yaml",
                       impl="xla", dtype=jnp.float32, tracker=cfg, nq=nq)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               image_size=(IMGSZ, IMGSZ), batch=1)
    variables, _ = apply_torch_state_dict(sd, variables, strict=True)

    step = jax.jit(lambda v, s, img: model.apply(v, s, img,
                                                 method=model.stream_step))
    state = init_track_state(1, model.tracker.n_slots, model.hd)
    frames = []
    for t in range(len(video)):
        state, packed = step(variables, state, jnp.asarray(video[t:t + 1]))
        out = unpack_outputs(np.asarray(packed))
        rows = []
        for i in range(out["valid"].shape[1]):
            if out["valid"][0, i] and out["obj_id"][0, i] >= 0:
                rows.append((int(out["obj_id"][0, i]),
                             np.asarray(out["box"][0, i], float),
                             float(out["score"][0, i])))
        frames.append(rows)
    return frames, model, variables


def _match_frames(ref_rows, our_rows, box_atol):
    """Greedy 1-1 row matching by box distance; returns list of
    (ref_id, our_id, box_err, ref_score, our_score) and unmatched counts."""
    used = set()
    pairs = []
    for rid, rbox, rsc in ref_rows:
        best, best_d = None, box_atol
        for j, (oid, obox, osc) in enumerate(our_rows):
            if j in used:
                continue
            d = float(np.max(np.abs(rbox - obox)))
            if d < best_d:
                best, best_d = j, d
        if best is not None:
            used.add(best)
            oid, obox, osc = our_rows[best]
            pairs.append((rid, oid, best_d, rsc, osc))
    return pairs, len(ref_rows) - len(pairs), len(our_rows) - len(pairs)


def test_composed_stream_parity(ref_model):
    tm, nq = ref_model
    video = _render_video(N_FRAMES)
    sd = {k: v.float().numpy() for k, v in tm.state_dict().items()}
    head = tm.model[-1]

    # --- selection-separation guard: top-k must not be a tie ------------
    # dense enc scores on frame 0 (hook the enc score head directly);
    # cross-framework enc-score noise is ~1e-5 (pinned by the eps fix this
    # test caught) — require the cut gap to clear it by 20x
    dense_cap = {}
    h = head.decoder.enc_score_head.register_forward_hook(
        lambda m, i, o: dense_cap.__setitem__(
            "d", o.detach()[0].max(-1).values.numpy().copy()))
    with torch.no_grad():
        head.decoder(_backbone_feats(tm, _to_torch(video[0:1])),
                     is_first=True)
    h.remove()
    dsort = np.sort(dense_cap["d"])[::-1]
    sel_gap = float(dsort[nq - 1] - dsort[nq])
    assert sel_gap > 2e-4, \
        f"degenerate fixture: enc top-k cut gap {sel_gap:.2e} is float noise"

    ref_frames = _run_reference(tm, video, SCORE_T, FILTER_T)
    # every birth/keep decision must sit far from both thresholds: the
    # comparison is only meaningful when no decision is a knife edge
    # (scores agree to ~1e-4 across frameworks)
    final_sc = np.concatenate(
        [np.array([s for _, _, s in rows], float) if rows else np.zeros(0)
         for rows in ref_frames])
    assert len(final_sc) > 0, "reference emitted no tracks"
    assert np.abs(final_sc - SCORE_T).min() > 2e-3
    assert np.abs(final_sc - FILTER_T).min() > 2e-3

    our_frames, _, _ = _run_ours(sd, video, SCORE_T, FILTER_T, nq)

    id_map = {}
    total_pairs = 0
    total_unmatched = 0
    for t, (rf, of) in enumerate(zip(ref_frames, our_frames)):
        pairs, miss_r, miss_o = _match_frames(rf, of, box_atol=5e-3)
        total_pairs += len(pairs)
        total_unmatched += miss_r + miss_o
        for rid, oid, derr, rsc, osc in pairs:
            # scores agree at sigmoid scale
            assert abs(rsc - osc) < 3e-2, (t, rid, rsc, osc)
            # obj-id bijection must be stable across the whole sequence
            if rid in id_map:
                assert id_map[rid] == oid, \
                    f"frame {t}: ref id {rid} flipped {id_map[rid]} -> {oid}"
            else:
                assert oid not in id_map.values(), \
                    f"frame {t}: our id {oid} claimed by two ref ids"
                id_map[rid] = oid
    # the composed loops must agree on (nearly) every emitted row
    assert total_pairs > 0
    assert total_unmatched <= max(1, int(0.05 * total_pairs)), \
        (total_pairs, total_unmatched)
    assert len(id_map) >= 2, "degenerate sequence: fewer than 2 identities"
