"""Positional embeddings, anchors and sigmoid-space helpers.

Functional equivalents of the reference math in
`ultralytics/nn/modules/transformer.py:pos2posemb` (CO-MOT box->embedding),
`ultralytics/nn/modules/utils.py:inverse_sigmoid`, and the anchor generator
`ultralytics/nn/modules/head.py:_generate_anchors` (MYDecoder). All are
shape-static and jittable.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Numerically clamped logit; identical semantics to the reference."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def pos2posemb(pos: jnp.ndarray, num_pos_feats: int = 64,
               temperature: float = 10000.0) -> jnp.ndarray:
    """Sine/cosine embedding of box coordinates.

    pos: [..., K] in [0, 1] -> [..., K * num_pos_feats]. With K=4 boxes and
    num_pos_feats=64 this yields the 256-d query positional embedding.
    """
    scale = 2.0 * math.pi
    pos = pos * scale
    dim_t = jnp.arange(num_pos_feats, dtype=pos.dtype)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    posemb = pos[..., None] / dim_t  # [..., K, F]
    # interleave: stack(sin of even slots, cos of odd slots) then flatten
    emb = jnp.stack([jnp.sin(posemb[..., 0::2]), jnp.cos(posemb[..., 1::2])], axis=-1)
    return emb.reshape(*pos.shape[:-1], pos.shape[-1] * num_pos_feats)


def generate_anchors(shapes: Sequence[Tuple[int, int]], grid_size: float = 0.05,
                     dtype=jnp.float32, eps: float = 1e-2):
    """Dense multi-level anchors in logit space.

    shapes: static ((h0, w0), (h1, w1), ...) per feature level.
    Returns (anchors [1, sum(h*w), 4] in logit space with invalid ones set to
    +inf, valid_mask [1, sum(h*w), 1] bool).
    """
    anchors = []
    for i, (h, w) in enumerate(shapes):
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                              indexing="ij")
        grid_xy = jnp.stack([gx, gy], -1)  # (h, w, 2)
        # NOTE: the reference normalizes by (h, w) in that order — x by h and
        # y by w — `head.py:1001-1002`; faithful reproduction matters for
        # weight-import parity so we keep it.
        valid_wh = jnp.array([h, w], dtype=dtype)
        grid_xy = (grid_xy + 0.5) / valid_wh
        wh = jnp.ones_like(grid_xy) * grid_size * (2.0 ** i)
        anchors.append(jnp.concatenate([grid_xy, wh], -1).reshape(1, h * w, 4))
    anchors = jnp.concatenate(anchors, 1)  # (1, S, 4)
    valid_mask = jnp.all((anchors > eps) & (anchors < 1 - eps), -1, keepdims=True)
    anchors = jnp.log(anchors / (1 - anchors))
    anchors = jnp.where(valid_mask, anchors, jnp.inf)
    return anchors, valid_mask
