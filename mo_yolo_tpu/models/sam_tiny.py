"""TinyViT image encoder — the MobileSAM backbone.

Re-design of the reference `sam/modules/tiny_encoder.py` (653 LoC torch):
conv patch embed (stride 4), one MBConv stage, three window-attention
stages with learned per-head relative-position bias tables and a local
depthwise conv between attention and MLP, PatchMerging downsamplers, and
the same 256-channel SAM neck — so a TinyViT drop-in produces the same
`[B, img/16, img/16, 256]` embedding contract as `ImageEncoderViT` and
feeds the same prompt/mask decoders (`build.py:55-64` mobile_sam).

TPU notes: everything NHWC with static shapes; the attention-bias index
table is computed once in numpy at trace time (it is a compile-time
constant, not a gather of a buffer as in torch); BN runs in inference
mode (the reference never trains SAM either — encoder weights come from
distillation)."""

from __future__ import annotations

import itertools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _ConvBN(nn.Module):
    out: int
    k: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, (self.k, self.k), strides=self.stride,
                    padding=self.k // 2, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        return nn.BatchNorm(use_running_average=True, name="bn")(x)


class _MBConv(nn.Module):
    dim: int
    expand: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = int(self.dim * self.expand)
        s = x
        x = nn.gelu(_ConvBN(h, 1, dtype=self.dtype, name="conv1")(x),
                    approximate=False)
        x = nn.gelu(_ConvBN(h, 3, groups=h, dtype=self.dtype,
                            name="conv2")(x), approximate=False)
        x = _ConvBN(self.dim, 1, dtype=self.dtype, name="conv3")(x)
        return nn.gelu(x + s, approximate=False)


class _PatchMerging(nn.Module):
    out: int
    stride: int = 2          # the 320-dim stage keeps resolution
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.gelu(_ConvBN(self.out, 1, dtype=self.dtype, name="conv1")(x),
                    approximate=False)
        x = nn.gelu(_ConvBN(self.out, 3, stride=self.stride,
                            groups=self.out, dtype=self.dtype,
                            name="conv2")(x), approximate=False)
        return _ConvBN(self.out, 1, dtype=self.dtype, name="conv3")(x)


def _bias_index(ws: int) -> Tuple[np.ndarray, int]:
    """Shared-offset index table (tiny_encoder.py:260-271): pairs with the
    same |dy|,|dx| share one learned bias column."""
    pts = list(itertools.product(range(ws), range(ws)))
    offsets, idxs = {}, []
    for p1 in pts:
        for p2 in pts:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            offsets.setdefault(off, len(offsets))
            idxs.append(offsets[off])
    return np.asarray(idxs, np.int32).reshape(len(pts), len(pts)), len(offsets)


class _BiasAttention(nn.Module):
    dim: int
    heads: int
    ws: int                     # window side; tokens = ws*ws
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):      # [B, N, C], N = ws*ws
        kd = self.dim // self.heads     # key_dim = head_dim (attn_ratio=1)
        idx, n_off = _bias_index(self.ws)
        bias = self.param("attention_biases", nn.initializers.zeros,
                          (self.heads, n_off))
        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(3 * self.heads * kd, dtype=self.dtype,
                       name="qkv")(x)
        B, N, _ = qkv.shape
        qkv = qkv.reshape(B, N, self.heads, 3 * kd)
        q, k, v = jnp.split(jnp.swapaxes(qkv, 1, 2), 3, axis=-1)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (kd ** -0.5), k)
        attn = attn + bias[:, jnp.asarray(idx)]
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        o = jnp.swapaxes(o, 1, 2).reshape(B, N, self.heads * kd)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(o)


class _TinyViTBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):      # [B, H, W, C]
        B, H, W, C = x.shape
        res = x
        ws = self.ws
        pad_b, pad_r = (-H) % ws, (-W) % ws
        h = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        pH, pW = H + pad_b, W + pad_r
        h = h.reshape(B, pH // ws, ws, pW // ws, ws, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
        h = _BiasAttention(self.dim, self.heads, ws, dtype=self.dtype,
                           name="attn")(h)
        h = h.reshape(B, pH // ws, pW // ws, ws, ws, C)
        h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
        x = res + h[:, :H, :W]
        # local depthwise conv between attention and MLP
        x = _ConvBN(self.dim, 3, groups=self.dim, dtype=self.dtype,
                    name="local_conv")(x)
        m = nn.LayerNorm(name="mlp_norm")(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="fc1")(m)
        m = nn.gelu(m, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(m)


class TinyViT(nn.Module):
    """MobileSAM encoder: -> [B, img/16, img/16, 256]."""

    img_size: int = 1024
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (2, 4, 5, 10)
    window_sizes: Sequence[int] = (7, 7, 14, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):
        mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
        x = (images - mean) / std
        d = self.embed_dims
        # patch embed: two stride-2 convs -> res/4
        x = nn.gelu(_ConvBN(d[0] // 2, 3, 2, dtype=self.dtype,
                            name="patch0")(x), approximate=False)
        x = _ConvBN(d[0], 3, 2, dtype=self.dtype, name="patch1")(x)
        # stage 0: MBConv
        for i in range(self.depths[0]):
            x = _MBConv(d[0], dtype=self.dtype, name=f"s0_b{i}")(x)
        x = _PatchMerging(d[1], 2, dtype=self.dtype, name="merge0")(x)
        # stages 1..3: window attention; last stage keeps resolution so the
        # output grid is img/16 (tiny_encoder.py:140-142 stride_c=1)
        for s in (1, 2, 3):
            for i in range(self.depths[s]):
                x = _TinyViTBlock(d[s], self.num_heads[s],
                                  self.window_sizes[s], dtype=self.dtype,
                                  name=f"s{s}_b{i}")(x)
            if s < 3:
                x = _PatchMerging(d[s + 1], 2 if s < 2 else 1,
                                  dtype=self.dtype, name=f"merge{s}")(x)
        x = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(256, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)
