"""Fixed-shape tracking state machine (jittable, TPU-native).

Re-designs the reference's dynamic track bookkeeping as masked vectorized
ops over a fixed slot count, combining three reference components:

  * `RuntimeTrackerBase` (`ultralytics/nn/modules/head.py:1143-1283`): ID
    lifecycle — enter at score>=0.4, disappear counter below 0.5, drop after
    miss_tolerance=5, greedy IoU>0.8 duplicate suppression, consecutive ID
    renumbering;
  * FSQM (`MOTR/models/fsqm.py`): the fixed-size query memory — inject new
    queries into free slots, evict inactive ones; its static-shape design is
    exactly what XLA wants, so it *is* our state layout;
  * QIM (`MOTR/models/qim.py:251-301`): track-query refresh between frames
    (self-attention over active tracks + FFN,
    ref = inverse_sigmoid(pred_boxes)), plus the training-time track
    dropout / false-positive injection (`qim.py:17-21,129-167`).

The reference's Python loops (sequential ID assignment `head.py:1232-1243`,
O(n^2) duplicate filter `head.py:1155-1171`) become a cumulative-sum ID
allocator and a fixed-point greedy suppression, both fully vectorized — no
host round-trips inside the frame loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.ops.boxes import pairwise_iou, xywh2xyxy
from mo_yolo_tpu.ops.embed import inverse_sigmoid


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Runtime tracker thresholds (reference `head.py:1146` defaults)."""
    n_slots: int = 300
    score_thresh: float = 0.4        # new-track entry threshold
    filter_score_thresh: float = 0.5  # keep threshold for existing tracks
    miss_tolerance: int = 5          # frames below threshold before drop
    dup_iou_thresh: float = 0.8      # duplicate suppression IoU
    dedup_iters: int = 0             # 0 = iterate to convergence (exact)


class TrackState(NamedTuple):
    """Per-stream track memory; every leaf is fixed-shape [B, N, ...]."""
    ref_logit: jnp.ndarray    # [B,N,4]  reference points, logit space
    query_pos: jnp.ndarray    # [B,N,hd] carried positional embedding
    embedding: jnp.ndarray    # [B,N,hd] QIM-refreshed output embedding
    pred_box: jnp.ndarray     # [B,N,4]  last predicted box (cxcywh, [0,1])
    obj_id: jnp.ndarray       # [B,N]    int32, -1 = free slot
    cls: jnp.ndarray          # [B,N]    int32 predicted class
    score: jnp.ndarray        # [B,N]    f32
    disappear: jnp.ndarray    # [B,N]    int32 consecutive low-score frames
    next_id: jnp.ndarray      # [B]      int32 ID allocator

    @property
    def active(self) -> jnp.ndarray:
        return self.obj_id >= 0


def init_track_state(batch: int, n_slots: int, hd: int = 256,
                     dtype=jnp.float32) -> TrackState:
    """Fresh memory for a new sequence (replaces the reference's broken
    `is_first` flag with an explicit reset — SURVEY.md 'hard parts' #5)."""
    z = lambda *s: jnp.zeros((batch, *s), dtype=dtype)
    return TrackState(
        ref_logit=z(n_slots, 4), query_pos=z(n_slots, hd),
        embedding=z(n_slots, hd), pred_box=z(n_slots, 4),
        obj_id=jnp.full((batch, n_slots), -1, jnp.int32),
        cls=jnp.zeros((batch, n_slots), jnp.int32),
        score=z(n_slots), disappear=jnp.zeros((batch, n_slots), jnp.int32),
        next_id=jnp.zeros((batch,), jnp.int32),
    )


def greedy_suppress(boxes: jnp.ndarray, valid: jnp.ndarray,
                    iou_thresh: float, iters: int = 0) -> jnp.ndarray:
    """Greedy earlier-index-wins duplicate suppression, vectorized.

    Equivalent to the reference's sequential O(n^2) `_filter_tracks`
    (`head.py:1155-1171`) computed as a fixed-point iteration:
    keep[j] = valid[j] & no earlier kept i with IoU(i, j) > thresh. Each
    iteration resolves one more level of conflict chaining; `iters` bounds
    the chain depth (duplicate chains at IoU 0.8 are short).

    boxes [M,4] cxcywh; valid [M] bool. Returns keep [M] bool.
    """
    M = boxes.shape[0]
    xy = xywh2xyxy(boxes)
    iou = pairwise_iou(xy, xy)
    earlier = jnp.triu(jnp.ones((M, M), bool), k=1)  # conflict[i, j]: i < j
    conflict = (iou > iou_thresh) & earlier & valid[:, None] & valid[None, :]
    return greedy_keep_from_conflicts(conflict, valid, iters)


def greedy_keep_from_conflicts(conflict: jnp.ndarray, valid: jnp.ndarray,
                               iters: int = 0) -> jnp.ndarray:
    """Fixed-point iteration of earlier-index-wins suppression given a
    boolean conflict matrix (conflict[i, j] with i < j blocks j when i is
    kept). iters=0 (default) runs to CONVERGENCE — exact equivalence with
    the sequential greedy for any conflict-chain depth, bounded by M
    iterations and typically done in 2-4 (each iteration resolves one more
    level of chaining, and the loop exits as soon as `keep` is stable).
    A positive `iters` runs that fixed count instead."""

    def step(keep):
        blocked = jnp.any(conflict & keep[:, None], axis=0)
        return valid & ~blocked

    if iters > 0:
        return jax.lax.fori_loop(0, iters, lambda _, k: step(k), valid)

    M = conflict.shape[0]

    def cond(s):
        keep, changed, it = s
        return changed & (it < M)

    def body(s):
        keep, _, it = s
        new = step(keep)
        return new, jnp.any(new != keep), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (step(valid), jnp.asarray(True), jnp.int32(0)))
    return keep


def runtime_update(state: TrackState,
                   cfg: TrackerConfig,
                   track_out: dict,
                   det_out: dict) -> Tuple[TrackState, dict]:
    """One frame of ID lifecycle + slot management (single stream, no batch).

    track_out / det_out: dicts with 'box' [K,4], 'score' [K], 'cls' [K],
    'embed' [K,hd], 'query_pos' [K,hd] for the track part (K=N) and detect
    part (K=Nd) of the decoder output.

    Returns (new_state_without_qim_refresh, outputs dict with the combined
    active set in combined order — used for emission and for QIM).
    """
    N = cfg.n_slots
    Nd = det_out["score"].shape[0]
    M = N + Nd

    # --- 1. existing-track lifecycle (reference head.py:1238-1243) ---
    active = state.obj_id >= 0
    low = track_out["score"] < cfg.filter_score_thresh
    disappear = jnp.where(active & low, state.disappear + 1, 0)
    drop = active & (disappear >= cfg.miss_tolerance)
    track_obj = jnp.where(drop, -1, state.obj_id)
    track_valid = track_obj >= 0

    # --- 2. combined set [track | detect] ---
    comb_box = jnp.concatenate([track_out["box"], det_out["box"]], 0)
    comb_score = jnp.concatenate([track_out["score"], det_out["score"]], 0)
    comb_cls = jnp.concatenate([track_out["cls"], det_out["cls"]], 0)
    comb_embed = jnp.concatenate([track_out["embed"], det_out["embed"]], 0)
    comb_qpos = jnp.concatenate([track_out["query_pos"], det_out["query_pos"]], 0)
    newborn_cand = det_out["score"] >= cfg.score_thresh
    comb_valid = jnp.concatenate([track_valid, newborn_cand], 0)

    # --- 3. duplicate suppression over the union (tracks take precedence) ---
    keep = greedy_suppress(comb_box, comb_valid, cfg.dup_iou_thresh,
                           cfg.dedup_iters)

    # --- 4. consecutive ID allocation for surviving newborns ---
    newborn = jnp.concatenate([jnp.zeros(N, bool), newborn_cand], 0) & keep
    new_ids = state.next_id + jnp.cumsum(newborn.astype(jnp.int32)) - 1
    comb_obj = jnp.concatenate([track_obj, jnp.full(Nd, -1, jnp.int32)], 0)
    comb_obj = jnp.where(newborn, new_ids, comb_obj)
    next_id = state.next_id + jnp.sum(newborn.astype(jnp.int32))
    comb_disappear = jnp.concatenate(
        [disappear, jnp.zeros(Nd, jnp.int32)], 0)

    # --- 5. compaction into N fixed slots (FSQM inject/evict) ---
    surv = keep & (comb_obj >= 0)
    pos = jnp.cumsum(surv.astype(jnp.int32)) - 1
    surv = surv & (pos < N)  # entries past slot capacity are not tracks
    slot = jnp.where(surv, pos, N)  # N = spill slot, sliced off

    def scatter(src, fill=0.0):
        buf = jnp.full((N + 1, *src.shape[1:]), fill, src.dtype)
        return buf.at[slot].set(src)[:N]

    new_state = TrackState(
        ref_logit=scatter(inverse_sigmoid(comb_box)),
        query_pos=scatter(comb_qpos),
        embedding=scatter(comb_embed),
        pred_box=scatter(comb_box),
        obj_id=scatter(comb_obj, fill=-1),
        cls=scatter(comb_cls),
        score=scatter(comb_score),
        disappear=scatter(comb_disappear),
        next_id=next_id,
    )
    outputs = {  # fixed-shape per-frame emission (combined order, masked)
        "box": comb_box, "score": comb_score, "cls": comb_cls,
        "obj_id": jnp.where(surv, comb_obj, -1), "valid": surv,
    }
    return new_state, outputs


def track_train_assign(obj_id: jnp.ndarray,       # [N] current track ids
                       gt_track_id: jnp.ndarray,  # [G]
                       gt_mask: jnp.ndarray,      # [G]
                       det_boxes: jnp.ndarray,    # [Nd,4]
                       det_logits: jnp.ndarray,   # [Nd,nc]
                       gt_boxes: jnp.ndarray,     # [G,4]
                       gt_cls: jnp.ndarray):      # [G]
    """Training-time track<->GT association (single stream).

    Vectorizes the MOTR matching steps (`head.py:339-491` /
    `MOTR/models/motr.py:175-292`):
      1. track slots whose obj_id equals a GT track_id match directly;
      2. the remaining (untracked) GTs are Hungarian-matched against the
         detect queries.

    Returns assign [G] int32 — combined [track|detect] query index per GT
    (-1 for padding / unmatched) — and `gt_tracked` [G] bool.
    """
    N = obj_id.shape[0]
    eq = (obj_id[:, None] == gt_track_id[None, :]) & gt_mask[None, :] & \
         (obj_id >= 0)[:, None]                                  # [N, G]
    gt_tracked = jnp.any(eq, axis=0)                             # [G]
    track_slot_of_gt = jnp.argmax(eq, axis=0)                    # [G]

    from mo_yolo_tpu.ops.matching import hungarian_jv, match_cost
    # the reference's LAST-layer track matching runs the head's
    # HungarianMatcherGroup with default cost_gain class=1 (head.py:123,
    # ops.py:899-902) — NOT the criterion's internal aux matcher
    # (loss.py:450, class=2)
    cost = match_cost(det_boxes, det_logits, gt_boxes, gt_cls,
                      gt_mask & ~gt_tracked, gain_class=1.0)
    det_assign = hungarian_jv(cost[None], (gt_mask & ~gt_tracked)[None])[0]

    assign = jnp.where(gt_tracked, track_slot_of_gt,
                       jnp.where(det_assign >= 0, N + det_assign, -1))
    return jnp.where(gt_mask, assign, -1).astype(jnp.int32), gt_tracked


def train_update(state: TrackState,
                 cfg: TrackerConfig,
                 assign: jnp.ndarray,        # [G] combined query idx per GT
                 gt_track_id: jnp.ndarray,   # [G]
                 gt_mask: jnp.ndarray,       # [G]
                 comb_box, comb_embed, comb_qpos, comb_score, comb_cls,
                 iou_keep_thresh: float = 0.5) -> TrackState:
    """GT-driven (teacher-forced) state propagation for training.

    Intended MOTR semantics (`qim.py:169-207` active selection +
    `head.py:453-455` ID assignment): slots/queries matched to a GT this
    frame become/remain the track set for the next frame, carrying the GT's
    track_id. Unmatched old tracks are dropped. Gradients flow through
    embedding/query_pos (the 5-frame recurrence); ref points are detached
    (`qim.py:300`, `head.py:1087-1089`).
    """
    N = cfg.n_slots
    M = comb_box.shape[0]
    matched = gt_mask & (assign >= 0)
    a_safe = jnp.clip(assign, 0, M - 1)

    # each matched GT contributes one next-frame track entry
    surv = matched
    pos = jnp.cumsum(surv.astype(jnp.int32)) - 1
    surv = surv & (pos < N)
    slot = jnp.where(surv, pos, N)

    def scatter(src_per_gt, fill=0.0):
        buf = jnp.full((N + 1, *src_per_gt.shape[1:]), fill, src_per_gt.dtype)
        return buf.at[slot].set(src_per_gt)[:N]

    box_g = comb_box[a_safe]
    new_state = TrackState(
        ref_logit=scatter(jax.lax.stop_gradient(inverse_sigmoid(box_g))),
        query_pos=scatter(comb_qpos[a_safe]),
        embedding=scatter(comb_embed[a_safe]),
        pred_box=scatter(jax.lax.stop_gradient(box_g)),
        obj_id=scatter(gt_track_id.astype(jnp.int32), fill=-1),
        cls=scatter(comb_cls[a_safe]),
        score=scatter(jax.lax.stop_gradient(comb_score[a_safe])),
        disappear=jnp.zeros((N,), jnp.int32),
        next_id=jnp.maximum(state.next_id,
                            jnp.max(jnp.where(matched, gt_track_id, -1)) + 1),
    )
    return new_state


def pack_outputs(outputs: dict) -> jnp.ndarray:
    """Pack per-frame emission into one [..., M, 8] f32 array:
    (cx, cy, w, h, score, cls, obj_id, valid). Single-array output means a
    single host transfer per frame."""
    f32 = jnp.float32
    return jnp.concatenate([
        outputs["box"].astype(f32),
        outputs["score"].astype(f32)[..., None],
        outputs["cls"].astype(f32)[..., None],
        outputs["obj_id"].astype(f32)[..., None],
        outputs["valid"].astype(f32)[..., None]], axis=-1)


def unpack_outputs(arr) -> dict:
    """Inverse of `pack_outputs` (host-side, numpy or jnp)."""
    import numpy as np
    a = np.asarray(arr)
    return {"box": a[..., 0:4], "score": a[..., 4],
            "cls": a[..., 5].astype(np.int32),
            "obj_id": a[..., 6].astype(np.int32),
            "valid": a[..., 7] > 0.5}


class QIM(nn.Module):
    """Query Interaction Module — track-embedding refresh between frames
    (intended semantics of `MOTR/models/qim.py:251-301`): masked
    self-attention over active tracks, FFN, optional query_pos update.
    """

    d_model: int = 256
    n_heads: int = 8
    # reference QIM is built with hidden_dim == d_model (head.py:117 passes
    # (d_model, decoder.hidden_dim, d_model*2); qim.py:87 uses hidden_dim
    # for linear1/linear2) — matching it keeps `.pt` imports shape-exact
    d_ffn: int = 256
    update_query_pos: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embedding, query_pos, active_mask):
        """embedding/query_pos [B,N,hd]; active_mask [B,N] bool.
        Returns (new_embedding, new_query_pos) with inactive slots passed
        through unchanged."""
        from mo_yolo_tpu.models.transformer import MultiHeadSelfAttention
        B, Nq, C = embedding.shape
        qk = embedding + query_pos
        # inactive slots must neither attend nor be attended to
        mask = ~(active_mask[:, None, :] & active_mask[:, :, None])  # [B,N,N]
        tgt2 = MultiHeadSelfAttention(self.d_model, self.n_heads,
                                      dtype=self.dtype, name="self_attn")(
            qk, qk, embedding, mask)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(embedding + tgt2)

        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.relu(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt + ff)

        new_pos = query_pos
        if self.update_query_pos:
            pf = nn.Dense(self.d_ffn, dtype=self.dtype, name="pos_linear1")(tgt)
            pf = nn.relu(pf)
            pf = nn.Dense(self.d_model, dtype=self.dtype, name="pos_linear2")(pf)
            new_pos = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pos_norm")(query_pos + pf)

        keep = active_mask[..., None]
        return (jnp.where(keep, tgt, embedding),
                jnp.where(keep, new_pos, query_pos))


def random_drop_tracks(key: jax.Array, state: TrackState,
                       drop_prob: float) -> TrackState:
    """Training-time track dropout (reference `qim.py:17-21`): each active
    track is dropped with probability p so the model learns re-detection.
    Masked op — slots are freed, shapes unchanged."""
    drop = (jax.random.uniform(key, state.obj_id.shape) < drop_prob) & state.active
    return state._replace(obj_id=jnp.where(drop, -1, state.obj_id))


def inject_fp_tracks(key: jax.Array, state: TrackState, det_boxes: jnp.ndarray,
                     det_embed: jnp.ndarray, det_qpos: jnp.ndarray,
                     fp_ratio: float = 0.3,
                     iou_thresh: float = 0.5) -> TrackState:
    """Training-time false-positive injection (reference `qim.py:129-167`):
    for a random subset of active tracks, copy the highest-IoU detect query
    into a free slot as a hard-negative track. obj_id = -2 marks FP tracks
    (as in the reference) so the matcher ignores them but they still act as
    track queries for one frame.

    Single-stream (unbatched) — vmap over the batch. det_* are detect-part
    decoder outputs [Nd, ...].
    """
    N = state.obj_id.shape[0]
    ksel, _ = jax.random.split(key)
    active = state.obj_id >= 0
    chosen = active & (jax.random.uniform(ksel, (N,)) < fp_ratio)
    iou = pairwise_iou(xywh2xyxy(state.pred_box), xywh2xyxy(det_boxes))  # [N,Nd]
    best_det = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    want = chosen & (best_iou > iou_thresh)
    # place each wanted FP into a free slot via cumsum ranks
    free = ~active
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1     # rank among free
    want_rank = jnp.cumsum(want.astype(jnp.int32)) - 1     # rank among wanted
    n_want = jnp.sum(want.astype(jnp.int32))
    take = free & (free_rank < n_want)
    # for each receiving slot, which wanted-track feeds it
    want_idx_sorted = jnp.argsort(jnp.where(want, want_rank, N + 1))
    src_track = want_idx_sorted[jnp.clip(free_rank, 0, N - 1)]
    src_det = best_det[src_track]

    def fill(dst, src):
        m = take[:, None] if dst.ndim == 2 else take
        return jnp.where(m, src, dst)

    return state._replace(
        obj_id=jnp.where(take, -2, state.obj_id),
        pred_box=fill(state.pred_box, det_boxes[src_det]),
        ref_logit=fill(state.ref_logit, inverse_sigmoid(det_boxes[src_det])),
        embedding=fill(state.embedding, det_embed[src_det]),
        query_pos=fill(state.query_pos, det_qpos[src_det]),
        score=jnp.where(take, 0.0, state.score),
        disappear=jnp.where(take, 0, state.disappear),
    )
