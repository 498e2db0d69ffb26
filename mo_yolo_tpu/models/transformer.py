"""Deformable-transformer decoder modules (flax.linen).

TPU-native re-design of the reference decoder stack
(`ultralytics/nn/modules/transformer.py`: MSDeformAttn:193-287,
MOTRDecoderLayer:515-652, MOTRTransformerDecoder:663-728). Key differences
from the torch code:

  * fixed query layout — [dn | track | detect] with static sizes; inactive
    track slots are masked out of self-attention by a per-batch key mask
    instead of being physically absent (the reference concatenates a
    dynamically sized track set, `head.py:1052-1064`);
  * the deformable sampling core is `mo_yolo_tpu.ops.deform_attn` (Pallas or
    pure-XLA), not `F.grid_sample`;
  * iterative box refinement runs inside a python loop over layers (static
    trip count — XLA unrolls and fuses it).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mo_yolo_tpu.models.layers import MLP, MultiHeadSelfAttention
from mo_yolo_tpu.ops.deform_attn import ms_deform_attn
from mo_yolo_tpu.ops.embed import inverse_sigmoid

NEG_INF = -1e9


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference init for sampling-offset bias (`transformer.py:221-231`):
    ring of unit directions per head, scaled by point index."""
    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
        grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
        return (grid * scale).reshape(-1).astype(dtype)
    return init


class MSDeformAttnModule(nn.Module):
    """Multi-scale deformable attention (reference `MSDeformAttn`)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"          # 'xla' | 'pallas'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, shapes: Sequence[Tuple[int, int]]):
        """query [B,Q,C]; refer_bbox [B,Q,4] in [0,1] (cxcywh);
        value [B,S,C]; shapes static ((h,w)...). Returns [B,Q,C]."""
        B, Q, C = query.shape
        S = value.shape[1]
        H, L, P = self.n_heads, self.n_levels, self.n_points
        D = C // H

        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, S, H, D)
        offsets = nn.Dense(H * L * P * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_offset_bias_init(H, L, P),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, H, L, P, 2)
        attn = nn.Dense(H * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(attn.reshape(B, Q, H, L * P), axis=-1)
        attn = attn.reshape(B, Q, H, L, P)

        # box-conditioned sampling (4-coord reference path, `transformer.py:281-282`)
        xy = refer_bbox[:, :, None, None, None, :2]
        wh = refer_bbox[:, :, None, None, None, 2:]
        loc = xy + offsets / P * wh * 0.5  # [B,Q,H,L,P,2]

        out = ms_deform_attn(v, tuple(shapes), loc, attn, impl=self.impl)
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out)


class TrackDecoderLayer(nn.Module):
    """One decoder layer: self-attn -> deformable cross-attn -> FFN
    (reference `MOTRDecoderLayer.forward`, `transformer.py:627-652`)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos,
                 attn_mask: Optional[jnp.ndarray] = None):
        qk = embed + query_pos
        tgt = MultiHeadSelfAttention(self.d_model, self.n_heads, dtype=self.dtype,
                                     name="self_attn")(qk, qk, embed, attn_mask)
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(embed + tgt)

        tgt = MSDeformAttnModule(self.d_model, self.n_levels, self.n_heads,
                                 self.n_points, impl=self.impl, dtype=self.dtype,
                                 name="cross_attn")(embed + query_pos, refer_bbox,
                                                    feats, shapes)
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(embed + tgt)

        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(embed)
        ff = nn.relu(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(embed + ff)


class TrackTransformerDecoder(nn.Module):
    """Decoder stack with per-layer iterative box refinement
    (reference `MOTRTransformerDecoder`, `transformer.py:663-728`).

    Returns (dec_bboxes [Lout,B,Q,4] sigmoid space, dec_scores [Lout,B,Q,nc],
    final embeddings [B,Q,C]). Lout = num_layers when training (per-layer aux
    outputs), else 1 (early exit at eval_idx — static slicing, so XLA never
    builds the dead layers at inference).
    """

    nc: int
    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    num_layers: int = 6
    eval_idx: int = -1
    impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox_logit, feats, shapes, query_pos,
                 attn_mask=None, train: bool = False):
        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.num_layers + self.eval_idx
        output = embed
        refer_bbox = jax.nn.sigmoid(refer_bbox_logit)
        dec_bboxes, dec_scores = [], []
        last_refined = None
        n_exec = self.num_layers if train else eval_idx + 1
        for i in range(self.num_layers):
            if i >= n_exec:
                # parameters must still be created so train/eval share the
                # same param tree; run on zero-size? Instead create modules
                # eagerly below via scope — simplest: break after declaring.
                pass
            layer = TrackDecoderLayer(self.d_model, self.n_heads, self.d_ffn,
                                      self.n_levels, self.n_points, impl=self.impl,
                                      dtype=self.dtype, name=f"layer{i}")
            bbox_head = MLP(self.d_model, 4, 3, dtype=self.dtype, name=f"bbox_head{i}")
            score_head = nn.Dense(self.nc, dtype=self.dtype,
                                  bias_init=nn.initializers.constant(
                                      _cls_bias_prior(self.nc)),
                                  name=f"score_head{i}")
            if i >= n_exec:
                # still materialize params for layers skipped at eval so the
                # variable tree is identical across modes
                if self.is_initializing():
                    _ = layer(output, refer_bbox, feats, shapes, query_pos, attn_mask)
                    _ = bbox_head(output)
                    _ = score_head(output)
                continue
            output = layer(output, refer_bbox, feats, shapes, query_pos, attn_mask)
            delta = bbox_head(output)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer_bbox))
            if train:
                dec_scores.append(score_head(output))
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(delta + inverse_sigmoid(last_refined)))
            elif i == eval_idx:
                dec_scores.append(score_head(output))
                dec_bboxes.append(refined)
            elif self.is_initializing():
                _ = score_head(output)  # materialize params skipped at eval
            last_refined = refined
            refer_bbox = jax.lax.stop_gradient(refined) if train else refined
        return jnp.stack(dec_bboxes), jnp.stack(dec_scores), output


def _cls_bias_prior(nc: int, prior: float = 0.01) -> float:
    """Reference `bias_init_with_prob(0.01) / 80 * nc` (`head.py:1118`)."""
    return float(-math.log((1 - prior) / prior) / 80 * nc)
