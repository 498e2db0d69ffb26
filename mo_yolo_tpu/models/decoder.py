"""TrackDecoder — the decoder-only detection/tracking head.

TPU-native equivalent of the reference `MYDecoder`
(`ultralytics/nn/modules/head.py:807-1137`): 1x1 conv input projection per
level, dense per-anchor score/bbox heads over the flattened multi-scale
features, top-k detect-query selection, and a deformable transformer decoder
over the concatenated [dn | track | detect] query set with iterative box
refinement.

TPU-first redesign decisions:
  * the query layout is STATIC — [num_dn | n_track_slots | num_queries] —
    with a boolean validity mask for track slots, instead of the reference's
    dynamically sized concatenation (`head.py:1052-1064`);
  * top-k selection uses `jax.lax.top_k` over the masked dense scores
    (static k, MXU/VPU friendly);
  * track reference points enter in logit space (the *intended* MOTR
    semantics — `MOTR/models/qim.py:298-301` sets
    ref = inverse_sigmoid(pred_boxes) — fixing the released code's
    double-sigmoid inconsistency documented in SURVEY.md).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.models.layers import MLP
from mo_yolo_tpu.models.transformer import (
    NEG_INF, TrackTransformerDecoder, _cls_bias_prior,
)
from mo_yolo_tpu.ops.embed import generate_anchors, pos2posemb


class TrackDecoder(nn.Module):
    nc: int = 80
    hd: int = 256           # hidden dim
    nq: int = 300           # num detect queries
    n_track: int = 0        # static track-slot count (0 = detection only)
    ndp: int = 4            # sampling points
    nh: int = 8             # heads
    ndl: int = 6            # decoder layers
    d_ffn: int = 1024
    eval_idx: int = -1
    impl: str = "xla"       # deformable attention impl
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self,
                 feats: Sequence[jnp.ndarray],          # NHWC per level
                 track_query_pos: Optional[jnp.ndarray] = None,  # [B,Nt,hd]
                 track_ref_logit: Optional[jnp.ndarray] = None,  # [B,Nt,4]
                 track_cls: Optional[jnp.ndarray] = None,        # [B,Nt] int
                 track_mask: Optional[jnp.ndarray] = None,       # [B,Nt] bool
                 dn_cls: Optional[jnp.ndarray] = None,           # [B,Ndn] int
                 dn_bbox_logit: Optional[jnp.ndarray] = None,    # [B,Ndn,4]
                 dn_attn_mask: Optional[jnp.ndarray] = None,     # [Qt,Qt] bool
                 train: bool = False):
        """Returns a dict of decoder outputs; query axis layout is
        [dn | track | detect] with static sizes (0 allowed for dn/track)."""
        B = feats[0].shape[0]
        shapes = tuple((f.shape[1], f.shape[2]) for f in feats)

        # --- input projection + flatten (reference `_get_encoder_input`) ---
        srcs = []
        for i, f in enumerate(feats):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"input_proj{i}_conv")(f)
            # the source constructs a DEFAULT nn.BatchNorm2d (`head.py:838`)
            # but `initialize_weights` (`tasks.py:253` ->
            # `torch_utils.py:261-263`) then rewrites EVERY BatchNorm2d to
            # eps=1e-3 / torch momentum 0.03 — the built model runs 1e-3,
            # and import parity must match it (caught by the composed
            # stream A/B: at running_var=1 the eps difference is a 5e-4
            # relative error on every projected feature)
            p = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"input_proj{i}_bn")(p)
            srcs.append(p.reshape(B, -1, self.hd))
        memory = jnp.concatenate(srcs, axis=1)  # [B, S, hd]

        # --- dense encoder heads + anchor priors (`_get_decoder_input`) ---
        anchors, valid_mask = generate_anchors(shapes, dtype=jnp.float32)
        anchors = anchors.astype(memory.dtype)
        features = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                name="enc_output_ln")(
            nn.Dense(self.hd, dtype=self.dtype, name="enc_output_dense")(
                jnp.where(valid_mask, memory, 0.0)))
        enc_scores_dense = nn.Dense(
            self.nc, dtype=self.dtype,
            bias_init=nn.initializers.constant(_cls_bias_prior(self.nc)),
            name="enc_score_head")(features)                      # [B,S,nc]
        enc_bbox_delta = MLP(self.hd, 4, 3, dtype=self.dtype,
                             name="enc_bbox_head")(features)
        enc_bboxes_dense = enc_bbox_delta + anchors                # logit space

        # --- top-k detect query selection ---
        cls_max = jnp.max(enc_scores_dense, axis=-1)               # [B,S]
        # invalid anchors carry +inf coords; exclude them from selection
        cls_max = jnp.where(valid_mask[..., 0], cls_max, NEG_INF)
        S = cls_max.shape[1]
        k = min(self.nq, S)
        _, topk_ind = jax.lax.top_k(cls_max, k)                    # [B,k]
        if k < self.nq:  # tiny inputs: repeat indices to keep nq static
            reps = -(-self.nq // k)
            topk_ind = jnp.tile(topk_ind, (1, reps))[:, :self.nq]
        take = lambda src: jnp.take_along_axis(src, topk_ind[..., None], axis=1)
        det_ref = take(enc_bboxes_dense)                           # [B,nq,4] logit
        det_scores = take(enc_scores_dense)                        # [B,nq,nc]
        det_embed = take(features)                                 # [B,nq,hd]
        if train:
            det_ref_in = jax.lax.stop_gradient(det_ref)
            det_embed = jax.lax.stop_gradient(det_embed)
        else:
            det_ref_in = det_ref
        # reference applies pos2posemb to the LOGIT-space refer_bbox
        # (`head.py:1054`: query_pos = pos2posemb(refer_bbox) before the
        # .sigmoid()) — imported weights only reproduce the reference
        # function if we embed the same space. NOTE the gradient path:
        # the reference computes query_pos BEFORE the training-time
        # detach (`head.py:1054` vs `:1088`), so decoder gradients DO
        # flow back through pos2posemb -> enc_bbox_head -> backbone
        # (caught by the torch training-parity A/B grad-norm bisect) —
        # only the decoder's refer input is detached
        det_query_pos = pos2posemb(det_ref, self.hd // 4)          # [B,nq,hd]

        # track-query class embedding (reference reuses the denoising class
        # embedding table for track content, `head.py:888-899`)
        class_embed = nn.Embed(self.nc, self.hd, dtype=self.dtype,
                               name="denoising_class_embed")
        if self.is_initializing():
            _ = class_embed(jnp.zeros((1,), jnp.int32))  # materialize table

        parts_embed, parts_ref, parts_pos = [], [], []
        n_dn = 0
        if dn_cls is not None:
            n_dn = dn_cls.shape[1]
            parts_embed.append(class_embed(dn_cls))
            parts_ref.append(dn_bbox_logit)
            # logit-space posemb, same as the detect queries (`head.py:1082`)
            parts_pos.append(pos2posemb(dn_bbox_logit, self.hd // 4))
        n_track = 0
        if track_ref_logit is not None:
            n_track = track_ref_logit.shape[1]
            parts_embed.append(class_embed(track_cls))
            parts_ref.append(track_ref_logit)
            parts_pos.append(track_query_pos)
        parts_embed.append(det_embed)
        parts_ref.append(det_ref_in)
        parts_pos.append(det_query_pos)

        embed = jnp.concatenate(parts_embed, axis=1)
        refer_logit = jnp.concatenate(parts_ref, axis=1)
        query_pos = jnp.concatenate(parts_pos, axis=1)
        Qt = embed.shape[1]

        # --- self-attention mask: dn block structure + inactive track slots ---
        if dn_attn_mask is not None:
            mask = jnp.broadcast_to(dn_attn_mask[None], (B, Qt, Qt))
        else:
            mask = jnp.zeros((B, Qt, Qt), dtype=bool)
        if n_track > 0 and track_mask is not None:
            key_block = jnp.zeros((B, Qt), dtype=bool)
            key_block = jax.lax.dynamic_update_slice(
                key_block, ~track_mask, (0, n_dn))
            mask = mask | key_block[:, None, :]

        dec_bboxes, dec_scores, out_embed = TrackTransformerDecoder(
            nc=self.nc, d_model=self.hd, n_heads=self.nh, d_ffn=self.d_ffn,
            n_levels=len(shapes), n_points=self.ndp, num_layers=self.ndl,
            eval_idx=self.eval_idx, impl=self.impl, dtype=self.dtype,
            name="decoder")(embed, refer_logit, memory, shapes, query_pos,
                            attn_mask=mask, train=train)

        return {
            "dec_bboxes": dec_bboxes,              # [Lout,B,Qt,4] in [0,1]
            "dec_scores": dec_scores,              # [Lout,B,Qt,nc] logits
            "enc_bboxes": jax.nn.sigmoid(det_ref),  # [B,nq,4]
            "enc_scores": det_scores,              # [B,nq,nc]
            "init_ref": jax.nn.sigmoid(refer_logit),  # [B,Qt,4]
            "embed": out_embed,                    # [B,Qt,hd]
            "query_pos": query_pos,                # [B,Qt,hd]
            "topk_ind": topk_ind,                  # [B,nq] anchor index
            "n_dn": n_dn,
            "n_track": n_track,
        }
