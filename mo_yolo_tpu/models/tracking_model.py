"""TrackingModel — the flagship per-frame model (backbone + decoder + tracker).

Task-model equivalent of the reference `TrackingModel`
(`ultralytics/nn/tasks.py:299-517`) + `MOTRTrack` head
(`ultralytics/nn/modules/head.py:90-513`), re-composed TPU-first:

  * ONE jitted step `stream_step(params, state, frames) -> (state, outputs)`
    serves both streaming inference and (scanned over a clip) training —
    the reference's `is_first` flag becomes an explicit `init_track_state`;
  * all tracker logic runs on-device inside the step (the reference's
    Python ID loops forced a host sync every frame);
  * fixed shapes everywhere: [dn | track(N) | detect(nq)] query layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.models.decoder import TrackDecoder
from mo_yolo_tpu.models.graph import BackboneNeck, GraphSpec, parse_model_yaml
from mo_yolo_tpu.models.tracker import (
    QIM, TrackerConfig, TrackState, init_track_state, runtime_update,
)


class TrackingModel(nn.Module):
    """Backbone/neck + TrackDecoder + QIM, with tracker state threading."""

    spec: GraphSpec
    tracker: TrackerConfig = TrackerConfig()
    hd: int = 256
    nq: int = 300
    ndl: int = 6
    d_ffn: int = 1024
    num_denoising: int = 100   # CDN query budget (reference `head.py:824`)
    impl: str = "xla"
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneNeck(self.spec, dtype=self.dtype)
        self.decoder = TrackDecoder(
            nc=self.spec.nc, hd=self.hd, nq=self.nq,
            n_track=self.tracker.n_slots, ndl=self.ndl, d_ffn=self.d_ffn,
            impl=self.impl, dtype=self.dtype)
        # d_ffn == hd: the reference QIM's hidden_dim (qim.py:87) — keeps
        # track_embed.* weight imports shape-exact
        self.qim = QIM(d_model=self.hd, d_ffn=self.hd, dtype=self.dtype)

    # ------------------------------------------------------------------ #
    def frame_forward(self, images, state: Optional[TrackState] = None,
                      dn_cls=None, dn_bbox_logit=None, dn_attn_mask=None,
                      train: bool = False):
        """Raw decoder outputs for one frame. images [B,H,W,3]: float in
        [0,1], or RAW uint8 (normalization folds into the stem kernel —
        `layers._TapStem`)."""
        feats = self.backbone(images, train=train)
        if state is None:
            return self.decoder(feats, train=train), feats
        track_mask = state.obj_id != -1  # -2 FP tracks participate as queries
        out = self.decoder(
            feats,
            track_query_pos=state.query_pos,
            track_ref_logit=state.ref_logit,
            track_cls=state.cls,
            track_mask=track_mask,
            dn_cls=dn_cls, dn_bbox_logit=dn_bbox_logit,
            dn_attn_mask=dn_attn_mask, train=train)
        return out, feats

    def __call__(self, images, state: Optional[TrackState] = None,
                 train: bool = False):
        """Default apply: detection/track forward, used for init + export."""
        out, _ = self.frame_forward(images, state, train=train)
        if state is not None:  # materialize QIM params during init
            _ = self.qim(state.embedding, state.query_pos, state.obj_id >= 0)
        return out

    # ------------------------------------------------------------------ #
    def stream_step(self, state: TrackState, images):
        """One inference frame: decoder -> ID lifecycle -> QIM refresh.

        Returns (new_state, outputs [B, M, 8]) — the fixed-shape combined
        [track|detect] detections PACKED into one array
        (box cxcywh | score | cls | obj_id | valid); unpack on host with
        `mo_yolo_tpu.models.tracker.unpack_outputs`. One array = ONE host
        transfer per frame (per-leaf fetches cost a full round trip each
        through remote runtimes).
        """
        out, _ = self.frame_forward(images, state, train=False)
        N = self.tracker.n_slots
        # tracker state stays f32 even when the network computes in bf16
        boxes = out["dec_bboxes"][-1].astype(jnp.float32)  # [B,Qt,4]
        logits = out["dec_scores"][-1].astype(jnp.float32)  # [B,Qt,nc]
        scores = jax.nn.sigmoid(logits).max(axis=-1)
        cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        embed = out["embed"].astype(jnp.float32)
        qpos = out["query_pos"].astype(jnp.float32)

        def part(a, lo, hi):
            return a[:, lo:hi]

        track_out = {"box": part(boxes, 0, N), "score": part(scores, 0, N),
                     "cls": part(cls, 0, N), "embed": part(embed, 0, N),
                     "query_pos": part(qpos, 0, N)}
        det_out = {"box": part(boxes, N, None), "score": part(scores, N, None),
                   "cls": part(cls, N, None), "embed": part(embed, N, None),
                   "query_pos": part(qpos, N, None)}

        new_state, outputs = jax.vmap(
            lambda s, t, d: runtime_update(s, self.tracker, t, d)
        )(state, track_out, det_out)

        emb, qp = self.qim(new_state.embedding, new_state.query_pos,
                           new_state.obj_id >= 0)
        new_state = new_state._replace(embedding=emb.astype(jnp.float32),
                                       query_pos=qp.astype(jnp.float32))
        from mo_yolo_tpu.models.tracker import pack_outputs
        return new_state, pack_outputs(outputs)


    # ------------------------------------------------------------------ #
    def train_frame(self, images, state: TrackState, gt_cls, gt_boxes,
                    gt_track_id, gt_mask, key,
                    drop_prob: float = 0.1, fp_ratio: float = 0.3):
        """One training frame: CDN build -> decoder -> MOTR association ->
        teacher-forced state propagation (+ track dropout / FP injection,
        reference `qim.py:17-21,129-167`) -> QIM refresh.

        gt_* are padded per-frame targets: gt_cls/gt_track_id [B,G] int32,
        gt_boxes [B,G,4] cxcywh normalized, gt_mask [B,G] bool.

        Returns (new_state, outs) where outs carries everything the loss
        needs (fixed shapes): dn/main decoder outputs split, enc outputs,
        the last-layer assignment, and the detect-query aux mask.
        """
        from mo_yolo_tpu.ops.denoising import build_cdn_group
        from mo_yolo_tpu.models.tracker import (
            inject_fp_tracks, random_drop_tracks, track_train_assign,
            train_update,
        )
        N = self.tracker.n_slots
        kdn, kdrop, kfp = jax.random.split(key, 3)
        if self.num_denoising > 0:
            cdn = build_cdn_group(kdn, gt_cls, gt_boxes, gt_mask,
                                  self.spec.nc, n_main=N + self.nq,
                                  num_denoising=self.num_denoising)
            out, _ = self.frame_forward(images, state, dn_cls=cdn.dn_cls,
                                        dn_bbox_logit=cdn.dn_bbox_logit,
                                        dn_attn_mask=cdn.attn_mask,
                                        train=True)
            n_dn, num_group = cdn.num_dn, cdn.num_group
        else:
            # no-CDN path (reference `get_track_cdn_group` returns Nones
            # when num_dn <= 0, `models/utils/ops.py:293-294`) — used by
            # the torch training-parity harness, where the two frameworks'
            # noise sources cannot be synchronized
            out, _ = self.frame_forward(images, state, train=True)
            n_dn, num_group = 0, 0
        boxes, logits = out["dec_bboxes"], out["dec_scores"]   # [L,B,Qt,...]
        dn_boxes, main_boxes = boxes[:, :, :n_dn], boxes[:, :, n_dn:]
        dn_logits, main_logits = logits[:, :, :n_dn], logits[:, :, n_dn:]

        det_boxes = main_boxes[-1][:, N:]
        det_logits = main_logits[-1][:, N:]
        assign, gt_tracked = jax.vmap(track_train_assign)(
            state.obj_id, gt_track_id, gt_mask, det_boxes, det_logits,
            gt_boxes, gt_cls)

        # tracker state stays f32 across the clip scan even in bf16 training
        embed = out["embed"][:, n_dn:].astype(jnp.float32)
        qpos = out["query_pos"][:, n_dn:].astype(jnp.float32)
        comb_score = jax.nn.sigmoid(
            main_logits[-1].astype(jnp.float32)).max(axis=-1)
        comb_cls = jnp.argmax(main_logits[-1], axis=-1).astype(jnp.int32)

        new_state = jax.vmap(
            lambda s, a, tid, m, box, emb, qp, sc, cl: train_update(
                s, self.tracker, a, tid, m, box, emb, qp, sc, cl)
        )(state, assign, gt_track_id, gt_mask,
          main_boxes[-1].astype(jnp.float32), embed, qpos,
          comb_score, comb_cls)

        new_state = random_drop_tracks(kdrop, new_state, drop_prob)
        fp_keys = jax.random.split(kfp, images.shape[0])
        new_state = jax.vmap(
            lambda k, s, db, de, dq: inject_fp_tracks(k, s, db, de, dq,
                                                      fp_ratio=fp_ratio)
        )(fp_keys, new_state, jax.lax.stop_gradient(det_boxes),
          embed[:, N:], qpos[:, N:])

        emb2, qp2 = self.qim(new_state.embedding, new_state.query_pos,
                             new_state.obj_id != -1)
        new_state = new_state._replace(embedding=emb2.astype(jnp.float32),
                                       query_pos=qp2.astype(jnp.float32))

        f32 = lambda x: x.astype(jnp.float32)  # losses accumulate in f32
        outs = {
            "main_boxes": f32(main_boxes), "main_logits": f32(main_logits),
            "dn_boxes": f32(dn_boxes), "dn_logits": f32(dn_logits),
            "enc_boxes": f32(out["enc_bboxes"]),
            "enc_logits": f32(out["enc_scores"]),
            "assign": assign, "num_dn_group": num_group,
            # which main-layer query rows were REAL queries this frame:
            # active/FP track slots + every detect query. Inactive slots
            # exist only for the static layout and carry no loss.
            "query_valid": jnp.concatenate(
                [state.obj_id != -1,
                 jnp.ones((images.shape[0], self.nq), bool)], axis=1),
        }
        return new_state, outs


def build_tracking_model(cfg_path: str, nc: Optional[int] = None,
                         impl: Optional[str] = None, dtype=jnp.float32,
                         tracker: Optional[TrackerConfig] = None,
                         nq: Optional[int] = None,
                         num_denoising: Optional[int] = None) -> TrackingModel:
    """Build the flagship model from an ultralytics-style yaml
    (drop-in for the reference's `yolo_track.yaml` and variants).

    impl=None auto-selects the deformable-attention path: the one-hot
    matmul formulation on TPU (round-4 kernel study: 13.2 vs 15.2 ms/frame
    over the Pallas kernel at 1536x800), the gather oracle on CPU.
    nq overrides the detect-query count (reference `head.decoder.num_queries`);
    num_denoising the CDN budget (reference `nd`, <=0 disables CDN).
    """
    if impl is None:
        impl = "onehot" if jax.default_backend() not in ("cpu",) else "xla"
    spec = parse_model_yaml(cfg_path, nc=nc)
    kw = {}
    if nq is not None:
        kw["nq"] = nq
    if num_denoising is not None:
        kw["num_denoising"] = num_denoising
    return TrackingModel(spec=spec, tracker=tracker or TrackerConfig(),
                         impl=impl, dtype=dtype, **kw)


def init_variables(model: TrackingModel, key, image_size=(640, 640), batch=1):
    """Initialize all parameter collections with a dummy frame + state."""
    state = init_track_state(batch, model.tracker.n_slots, model.hd,
                             dtype=model.dtype)
    imgs = jnp.zeros((batch, *image_size, 3), model.dtype)
    return model.init(key, imgs, state, train=False)
