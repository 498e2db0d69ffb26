"""Unit tests for the fixed-shape tracking state machine.

Covers the reference semantics of `RuntimeTrackerBase`
(ID assignment / disappear / drop / duplicate suppression on synthetic score
sequences — SURVEY.md §4 test-pyramid item (2)) realized as masked ops.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mo_yolo_tpu.models.tracker import (
    QIM, TrackerConfig, TrackState, greedy_suppress, init_track_state,
    random_drop_tracks, runtime_update,
)


def _python_greedy(boxes, valid, thresh):
    """Oracle: the reference's sequential `_filter_tracks` (head.py:1155-1171)."""
    def iou(a, b):
        ax1, ay1, ax2, ay2 = a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2
        bx1, by1, bx2, by2 = b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2
        ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        iy = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = ix * iy
        return inter / (a[2] * a[3] + b[2] * b[3] - inter + 1e-7)

    M = len(boxes)
    keep = list(valid)
    for i in range(M):
        if not keep[i]:
            continue
        for j in range(i + 1, M):
            if keep[j] and iou(boxes[i], boxes[j]) > thresh:
                keep[j] = False
    return np.array(keep)


def test_greedy_keep_matches_sequential_on_random_conflicts():
    """Algorithm-level check on identical boolean inputs: the fixed-point
    iteration equals the sequential greedy scan."""
    from mo_yolo_tpu.models.tracker import greedy_keep_from_conflicts
    rng = np.random.default_rng(0)
    for trial in range(10):
        M = 30
        conf = np.triu(rng.uniform(size=(M, M)) < 0.15, k=1)  # conflict[i, j], i < j
        valid = rng.uniform(size=M) > 0.2
        conf = conf & valid[:, None] & valid[None, :]
        # sequential greedy oracle
        keep = valid.copy()
        for i in range(M):
            if keep[i]:
                for j in range(i + 1, M):
                    if conf[i, j]:
                        keep[j] = False
        got = np.asarray(greedy_keep_from_conflicts(jnp.asarray(conf),
                                                    jnp.asarray(valid), iters=M))
        np.testing.assert_array_equal(got, keep, err_msg=f"trial {trial}")


def test_greedy_suppress_matches_sequential_oracle():
    rng = np.random.default_rng(0)
    for trial in range(5):
        M = 40
        # clustered duplicates (high IoU within cluster), far between clusters
        centers = rng.uniform(0.2, 0.8, size=(8, 2))
        boxes = np.concatenate([
            centers[rng.integers(0, 8, M)] + rng.normal(0, 0.001, (M, 2)),
            np.full((M, 2), 0.1)], axis=1)
        valid = rng.uniform(size=M) > 0.2
        got = np.asarray(greedy_suppress(jnp.asarray(boxes, jnp.float32),
                                         jnp.asarray(valid), 0.8))
        # sequential greedy on the SAME f32 IoU matrix (avoids f32-vs-f64
        # disagreement for pairs landing exactly on the threshold)
        from mo_yolo_tpu.ops.boxes import pairwise_iou, xywh2xyxy
        xy = xywh2xyxy(jnp.asarray(boxes, jnp.float32))
        iou = np.asarray(pairwise_iou(xy, xy))
        keep = valid.copy()
        for i in range(M):
            if keep[i]:
                for j in range(i + 1, M):
                    if keep[j] and valid[i] and iou[i, j] > 0.8:
                        keep[j] = False
        np.testing.assert_array_equal(got, keep, err_msg=f"trial {trial}")


def _mk_outs(boxes, scores, hd=8):
    k = len(scores)
    return {"box": jnp.asarray(boxes, jnp.float32),
            "score": jnp.asarray(scores, jnp.float32),
            "cls": jnp.zeros(k, jnp.int32),
            "embed": jnp.ones((k, hd)) * jnp.arange(k)[:, None],
            "query_pos": jnp.zeros((k, hd))}


def test_runtime_update_lifecycle():
    cfg = TrackerConfig(n_slots=4, miss_tolerance=2)
    state = jax.tree.map(lambda x: x[0], init_track_state(1, 4, hd=8))

    # frame 1: two confident detections far apart -> two new tracks
    det_boxes = np.array([[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1],
                          [0.5, 0.5, 0.05, 0.05]])
    t = _mk_outs(np.zeros((4, 4)), np.zeros(4))
    d = _mk_outs(det_boxes, [0.9, 0.8, 0.1])  # third below 0.4
    state, out = runtime_update(state, cfg, t, d)
    assert int((state.obj_id >= 0).sum()) == 2
    assert set(np.asarray(state.obj_id[state.obj_id >= 0]).tolist()) == {0, 1}
    assert int(state.next_id) == 2

    # frame 2: track 0 confident, track 1 low score -> disappear count 1
    t = _mk_outs(np.array([[0.21, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1],
                           [0, 0, 0, 0], [0, 0, 0, 0]]),
                 [0.9, 0.3, 0.0, 0.0])
    d = _mk_outs(np.zeros((3, 4)), [0.0, 0.0, 0.0])
    state, out = runtime_update(state, cfg, t, d)
    assert int((state.obj_id >= 0).sum()) == 2
    assert int(state.disappear[state.obj_id == 1][0]) == 1

    # frame 3: track 1 low again -> dropped (miss_tolerance=2)
    t = _mk_outs(np.array([[0.21, 0.2, 0.1, 0.1], [0.7, 0.7, 0.1, 0.1],
                           [0, 0, 0, 0], [0, 0, 0, 0]]),
                 [0.9, 0.3, 0.0, 0.0])
    state, out = runtime_update(state, cfg, t, d)
    ids = np.asarray(state.obj_id)
    assert (ids >= 0).sum() == 1 and ids[ids >= 0][0] == 0

    # frame 4: new detection overlapping surviving track -> suppressed dup
    t = _mk_outs(np.array([[0.2, 0.2, 0.1, 0.1], [0, 0, 0, 0],
                           [0, 0, 0, 0], [0, 0, 0, 0]]), [0.9, 0, 0, 0])
    d = _mk_outs(np.array([[0.2, 0.2, 0.1, 0.1], [0.9, 0.2, 0.08, 0.08],
                           [0, 0, 0, 0]]), [0.95, 0.85, 0.0])
    state, out = runtime_update(state, cfg, t, d)
    ids = np.asarray(state.obj_id)
    assert (ids >= 0).sum() == 2           # old track + one genuinely new
    assert int(state.next_id) == 3         # only one ID consumed


def test_runtime_update_slot_compaction():
    """Newborns land in the first free slots (FSQM injection semantics)."""
    cfg = TrackerConfig(n_slots=3)
    state = jax.tree.map(lambda x: x[0], init_track_state(1, 3, hd=8))
    t = _mk_outs(np.zeros((3, 4)), np.zeros(3))
    d = _mk_outs(np.array([[0.1, 0.1, 0.05, 0.05], [0.5, 0.5, 0.05, 0.05],
                           [0.9, 0.9, 0.05, 0.05], [0.3, 0.7, 0.05, 0.05]]),
                 [0.9, 0.9, 0.9, 0.9])
    state, out = runtime_update(state, cfg, t, d)
    # 4 candidates, 3 slots: first 3 by combined order win
    np.testing.assert_array_equal(np.asarray(state.obj_id), [0, 1, 2])
    assert int(state.next_id) == 4  # 4 allocated, one spilled (bounded memory)


def test_qim_passthrough_inactive():
    qim = QIM(d_model=8, n_heads=2, d_ffn=16)
    emb = jnp.ones((1, 4, 8))
    pos = jnp.zeros((1, 4, 8))
    mask = jnp.array([[True, True, False, False]])
    v = qim.init(jax.random.PRNGKey(0), emb, pos, mask)
    out_emb, out_pos = qim.apply(v, emb, pos, mask)
    # inactive slots unchanged
    np.testing.assert_allclose(np.asarray(out_emb[0, 2:]), 1.0)
    # active slots updated
    assert not np.allclose(np.asarray(out_emb[0, :2]), 1.0)


def test_random_drop_tracks():
    state = init_track_state(1, 100, hd=4)
    state = state._replace(obj_id=jnp.arange(100, dtype=jnp.int32)[None])
    dropped = random_drop_tracks(jax.random.PRNGKey(0), state, 0.5)
    frac = float((dropped.obj_id < 0).mean())
    assert 0.3 < frac < 0.7
    untouched = random_drop_tracks(jax.random.PRNGKey(0), state, 0.0)
    np.testing.assert_array_equal(np.asarray(untouched.obj_id),
                                  np.asarray(state.obj_id))


def test_greedy_suppress_long_chain_converges_by_default():
    """A 30-deep overlapping chain needs 15 suppression levels; the default
    (converge-to-fixed-point) must match the sequential greedy exactly —
    the old fixed iters=8 default under-suppressed such chains (round-1
    weak #7)."""
    import jax.numpy as jnp
    from mo_yolo_tpu.models.tracker import greedy_suppress

    M = 30
    # boxes on a line, each overlapping its neighbor with IoU ~0.82
    w = 1.0
    step = 0.09  # IoU = (w-step)/(w+step) ~ 0.835 > 0.8
    boxes = jnp.stack([jnp.arange(M) * step + w / 2,
                       jnp.full((M,), 0.5),
                       jnp.full((M,), w),
                       jnp.full((M,), w)], 1)
    valid = jnp.ones((M,), bool)
    keep = np.asarray(greedy_suppress(boxes, valid, iou_thresh=0.8))

    # sequential greedy oracle
    import numpy as onp
    b = onp.asarray(boxes)
    xy = onp.stack([b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2,
                    b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2], 1)

    def iou(a, c):
        x1 = max(a[0], c[0]); y1 = max(a[1], c[1])
        x2 = min(a[2], c[2]); y2 = min(a[3], c[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (c[2] - c[0]) * (c[3] - c[1]) - inter
        return inter / ua

    ref = onp.ones(M, bool)
    for j in range(M):
        for i in range(j):
            if ref[i] and iou(xy[i], xy[j]) > 0.8:
                ref[j] = False
                break
    onp.testing.assert_array_equal(keep, ref)
    assert ref.sum() == 15  # alternating keeps on the chain
