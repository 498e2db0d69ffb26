"""YOLOv8 backbone/neck primitives as flax.linen modules (NHWC, TPU layout).

Functional equivalents of the reference blocks in
`ultralytics/nn/modules/conv.py` (Conv/DWConv/Concat) and
`ultralytics/nn/modules/block.py` (Bottleneck/C2f/SPPF) — re-designed for
XLA: NHWC convolutions (TPU-native layout), BatchNorm with flax batch_stats
collections, SiLU activations left to XLA fusion. BN epsilon/momentum match
the reference (eps=1e-3, torch momentum 0.03 -> flax momentum 0.97) so
imported reference weights reproduce activations exactly.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, d: int = 1) -> int:
    """'same' padding for odd kernels (reference `conv.py:autopad`)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


class _TapStem(nn.Module):
    """uint8-input k3 conv: normalize on device, then the native conv.

    HISTORY (round-5 correction): round 4 shipped this as 9 strided tap
    slices + one 27-wide matmul, based on a benchmark harness whose
    `sum(conv(x))` reduction XLA strength-reduced away — the "0.033 ms"
    reading measured nothing. Honest re-measurement (abs-reduction,
    /tmp-probe preserved as scripts/backbone_opt_bench.py methodology)
    puts the tap formulation at **22.7 ms** at 1536x800 — strided u8
    sub-lane slicing is catastrophic on TPU — vs **1.23 ms** for the
    plain convert+conv below. The u8 streaming contract itself stands
    (4x fewer PCIe bytes); only the on-device stem math changed.

    Param tree is identical to nn.Conv (name "kernel", shape [k,k,C,F]),
    so checkpoint import/export and the float-input path share weights.
    """

    filters: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_u8):
        C = x_u8.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.filters))
        x = x_u8.astype(self.dtype) * (1.0 / 255.0)
        return jax.lax.conv_general_dilated(
            x, w.astype(self.dtype), (self.stride, self.stride),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


class _S2DConv(nn.Module):
    """k3 stride-2 conv on a low-channel tensor as space-to-depth + k2s1.

    XLA's native lowering of a k3s2 conv with 64 input channels runs ~5x
    off its roofline on TPU (half-empty lanes + a stride-2 access
    pattern Mosaic pipelines poorly — measured 0.50 vs roofline 0.098 ms
    for the /2->/4 node of yolo_track at 1536x800,
    scripts/backbone_opt_bench.py). Packing 2x2 spatial blocks into
    channels (4C wide) and convolving k2/s1 with the rearranged kernel
    computes the identical function — w2[p,q,(2a+b)C+c,f] =
    w[2p+a-1,2q+b-1,c,f], out-of-range taps zero — at full lane width:
    measured 0.33 ms (1.78x the FLOPs, ~3x the utilization).

    Param tree is identical to nn.Conv ("kernel", [3,3,C,F]) so
    checkpoint import/export and the generic path share weights.
    """

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.filters)).astype(self.dtype)
        zero = jnp.zeros_like(w[0, 0])
        rows = []
        for p in range(2):
            cols = []
            for q in range(2):
                blocks = []
                for a in range(2):
                    for b in range(2):
                        u, v = 2 * p + a - 1, 2 * q + b - 1
                        blocks.append(w[u, v] if 0 <= u <= 2 and
                                      0 <= v <= 2 else zero)
                cols.append(jnp.concatenate(blocks, axis=0))    # [4C, F]
            rows.append(jnp.stack(cols, 0))
        w2 = jnp.stack(rows, 0)                             # [2,2,4C,F]
        # pad 2 top/left on the unpacked tensor == pad 1 packed unit; the
        # k2/s1/VALID output row i then reads packed rows (i-1, i) —
        # exactly the stride-2 window of out(i)
        xp = jnp.pad(x, ((0, 0), (2, 0), (2, 0), (0, 0)))
        xp = xp.reshape(B, (H + 2) // 2, 2, (W + 2) // 2, 2, C)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (H + 2) // 2, (W + 2) // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            xp, w2, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)


class _TapConv(nn.Module):
    """k3 stride-1 conv on a low-channel tensor as 9 tap slices + one
    matmul (im2col in XLA; the stem's `_TapStem` trick without the /255
    fold). The 64-channel bottleneck convs inside the /4 C2f run ~5x off
    roofline as native convs (0.17-0.22 ms vs 0.033 at 1536x800);
    contracting all 9 taps in one 576-wide dot measured 0.06 ms
    (scripts/backbone_opt_bench.py `tj`). Param tree identical to
    nn.Conv ("kernel", [3,3,C,F])."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, C, self.filters))
        wf = w.reshape(9 * C, self.filters).astype(self.dtype)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, di:di + H, dj:dj + W, :]
                for di in range(3) for dj in range(3)]
        p = jnp.concatenate(taps, axis=-1)
        return jax.lax.dot_general(p, wf, (((3,), (0,)), ((), ())),
                                   preferred_element_type=self.dtype)


# Channel thresholds below which k3 convs route to the reformulations
# above. ISOLATED probes showed low-channel convs 3-5x off roofline with
# big reformulation wins (scripts/backbone_opt_bench.py), but IN CONTEXT
# the full backbone measured *slower* with them (5.06 ms plain vs
# 6.15 ms reformulated at 1536x800 u8): XLA fuses conv+BN+SiLU chains it
# cannot fuse across the concat/dot formulations. Default OFF; the env
# knobs remain the A/B instrument for future XLA versions.
_LOW_CH_S2D = int(os.environ.get("MO_YOLO_LOW_CH_S2D", "0"))
_LOW_CH_TAPS = int(os.environ.get("MO_YOLO_LOW_CH_TAPS", "0"))


class ConvBnAct(nn.Module):
    """Conv2D + BatchNorm + activation (the reference's `Conv` primitive).

    At inference the BN can be folded into the conv (`fuse`), mirroring
    `nn/tasks.py:122-147`; under XLA the unfused form compiles to the same
    fused HLO so we keep BN explicit and rely on `use_running_average`.

    act: True = SiLU (reference default), "relu" = ReLU (HG blocks),
    False = linear. padding: None = autopad ('same'), int = explicit.

    Accepts RAW uint8 input (the streaming path ships unnormalized u8
    frames): the k3 stem takes the `_TapStem` fast formulation with /255
    folded into the kernel; any other geometry normalizes then convolves.
    Low-channel k3 convs route to `_S2DConv`/`_TapConv` (same function,
    TPU-friendly layout). All paths share the nn.Conv param tree.
    """

    filters: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Any = True
    padding: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding if self.padding is not None else \
            autopad(self.kernel, self.dilation)
        plain_k3 = (self.kernel == 3 and p == 1 and self.groups == 1
                    and self.dilation == 1)
        # lower bound excludes the 3-channel float stem (handled above
        # for u8; reformulations measured no win on float 3-ch)
        C_in = x.shape[-1]
        even_hw = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if x.dtype == jnp.uint8 and plain_k3:
            x = _TapStem(self.filters, stride=self.stride,
                         dtype=self.dtype, name="conv")(x)
        elif plain_k3 and 8 <= C_in <= _LOW_CH_S2D and self.stride == 2 \
                and even_hw:
            x = _S2DConv(self.filters, dtype=self.dtype, name="conv")(x)
        elif plain_k3 and 8 <= C_in <= _LOW_CH_TAPS and self.stride == 1:
            x = _TapConv(self.filters, dtype=self.dtype, name="conv")(x)
        else:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) * (1.0 / 255.0)
            x = nn.Conv(self.filters, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((p, p), (p, p)),
                        feature_group_count=self.groups,
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act:
            x = nn.silu(x)
        return x


class Bottleneck(nn.Module):
    """Standard YOLOv8 bottleneck (reference `block.py:Bottleneck`)."""

    filters: int
    shortcut: bool = True
    kernels: Tuple[int, int] = (3, 3)
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.filters * self.expansion)
        y = ConvBnAct(c_, self.kernels[0], dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.filters, self.kernels[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.filters:
            return x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convolutions, fast variant (reference `block.py:C2f`)."""

    filters: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.filters * self.expansion)
        y = ConvBnAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, (3, 3), 1.0,
                                    dtype=self.dtype, name=f"m{i}")(parts[-1], train))
        y = jnp.concatenate(parts, axis=-1)
        return ConvBnAct(self.filters, 1, dtype=self.dtype, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference `block.py:SPPF`)."""

    filters: int
    kernel: int = 5
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train)
        k = self.kernel
        pad = k // 2
        outs = [y]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (k, k), strides=(1, 1),
                                    padding=((pad, pad), (pad, pad))))
        y = jnp.concatenate(outs, axis=-1)
        return ConvBnAct(self.filters, 1, act=self.act, dtype=self.dtype,
                         name="cv2")(y, train)


class SPP(nn.Module):
    """Spatial pyramid pooling, parallel variant (reference `block.py:SPP`;
    used by the shipped `v3/yolov3-spp.yaml` graph)."""

    filters: int
    kernels: Tuple[int, ...] = (5, 9, 13)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        outs = [y] + [nn.max_pool(y, (k, k), strides=(1, 1),
                                  padding=((k // 2, k // 2),) * 2)
                      for k in self.kernels]
        return ConvBnAct(self.filters, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(outs, -1), train)


class DWConv(nn.Module):
    """Depthwise Conv+BN+act (reference `conv.py:DWConv`)."""

    filters: int
    kernel: int = 1
    stride: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = _gcd(x.shape[-1], self.filters)
        return ConvBnAct(self.filters, self.kernel, self.stride, groups=g,
                         act=self.act, dtype=self.dtype, name="conv")(x, train)


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


class ConvTranspose(nn.Module):
    """Transposed conv + optional BN + act (reference
    `conv.py:ConvTranspose`; used by upsampling necks)."""

    filters: int
    kernel: int = 2
    stride: int = 2
    bn: bool = True
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.filters, (self.kernel, self.kernel),
                             strides=(self.stride, self.stride),
                             padding="VALID" if self.kernel == self.stride
                             else "SAME",
                             use_bias=not self.bn, dtype=self.dtype,
                             name="conv_transpose")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                             epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act:
            x = nn.silu(x)
        return x


class Focus(nn.Module):
    """Space-to-depth stem (reference `conv.py:Focus`): 2x2 pixel
    de-interleave into channels, then a conv — stride-2 with no
    information loss."""

    filters: int
    kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                             x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        return ConvBnAct(self.filters, self.kernel, dtype=self.dtype,
                         name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference `conv.py:GhostConv`): half the
    channels from a dense conv, half from a cheap depthwise 5x5 on top."""

    filters: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.filters // 2
        y = ConvBnAct(c_, self.kernel, self.stride, dtype=self.dtype,
                      name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, groups=c_, dtype=self.dtype,
                       name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference `block.py:C3`)."""

    filters: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.filters * self.expansion)
        a = ConvBnAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, (1, 3), 1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        b = ConvBnAct(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([a, b], axis=-1)
        return ConvBnAct(self.filters, 1, dtype=self.dtype, name="cv3")(y, train)


class RepConv(nn.Module):
    """Re-parameterizable conv (reference `conv.py:RepConv`, train form):
    3x3 conv+BN plus 1x1 conv+BN summed, then SiLU. On TPU the two
    branches fuse into adjacent HLO convolutions; the deploy-time algebraic
    fusion is unnecessary for inference speed under XLA."""

    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBnAct(self.filters, 3, act=False, dtype=self.dtype,
                      name="conv1")(x, train)
        b = ConvBnAct(self.filters, 1, act=False, dtype=self.dtype,
                      name="conv2")(x, train)
        return nn.silu(a + b)


class RepC3(nn.Module):
    """RT-DETR neck block (reference `block.py:RepC3`)."""

    filters: int
    n: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = ConvBnAct(self.filters, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepConv(self.filters, dtype=self.dtype, name=f"m{i}")(a, train)
        b = ConvBnAct(self.filters, 1, dtype=self.dtype, name="cv2")(x, train)
        return a + b  # cv3 is Identity at e=1.0


class HGStem(nn.Module):
    """PPHGNetV2 stem (reference `block.py:HGStem`): 5 ReLU convs + a
    stride-1 maxpool branch; overall stride 4."""

    cm: int
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.cm, 3, 2, act="relu", dtype=self.dtype,
                      name="stem1")(x, train)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBnAct(self.cm // 2, 2, 1, act="relu", padding=0,
                       dtype=self.dtype, name="stem2a")(x, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBnAct(self.cm, 2, 1, act="relu", padding=0,
                       dtype=self.dtype, name="stem2b")(x2, train)
        x1 = nn.max_pool(x, (2, 2), strides=(1, 1))
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBnAct(self.cm, 3, 2, act="relu", dtype=self.dtype,
                      name="stem3")(x, train)
        return ConvBnAct(self.filters, 1, 1, act="relu", dtype=self.dtype,
                         name="stem4")(x, train)


class LightConv(nn.Module):
    """1x1 linear conv + depthwise k conv (reference `conv.py:LightConv`)."""

    filters: int
    kernel: int = 3
    act: Any = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnAct(self.filters, 1, act=False, dtype=self.dtype,
                      name="conv1")(x, train)
        return ConvBnAct(self.filters, self.kernel, groups=self.filters,
                         act=self.act, dtype=self.dtype, name="conv2")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block (reference `block.py:HGBlock`): n chained convs,
    concat of all intermediates, squeeze/excite 1x1 convs, optional
    residual."""

    cm: int
    filters: int
    kernel: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.kernel, dtype=self.dtype,
                                    name=f"m{i}")(ys[-1], train))
            else:
                ys.append(ConvBnAct(self.cm, self.kernel, act="relu",
                                    dtype=self.dtype,
                                    name=f"m{i}")(ys[-1], train))
        y = jnp.concatenate(ys, axis=-1)
        y = ConvBnAct(self.filters // 2, 1, act="relu", dtype=self.dtype,
                      name="sc")(y, train)
        y = ConvBnAct(self.filters, 1, act="relu", dtype=self.dtype,
                      name="ec")(y, train)
        if self.shortcut and x.shape[-1] == self.filters:
            return y + x
        return y


_NEG_INF = -1e9


class MultiHeadSelfAttention(nn.Module):
    """Query self-attention with additive mask (torch `nn.MultiheadAttention`
    semantics: shared qkv projections, softmax over keys)."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None):
        """q/k/v [B,Q,C]; mask [B,Q,Q] bool (True = blocked) or None."""
        B, Q, C = q.shape
        H = self.n_heads
        D = C // H
        qp = nn.Dense(C, dtype=self.dtype, name="q_proj")(q).reshape(B, Q, H, D)
        kp = nn.Dense(C, dtype=self.dtype, name="k_proj")(k).reshape(B, Q, H, D)
        vp = nn.Dense(C, dtype=self.dtype, name="v_proj")(v).reshape(B, Q, H, D)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / math.sqrt(D)
        if mask is not None:
            logits = jnp.where(mask[:, None, :, :], _NEG_INF, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vp).reshape(B, Q, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


def sincos_pos_2d(w: int, h: int, dim: int,
                  temperature: float = 10000.0) -> jnp.ndarray:
    """2D sin-cos positional embedding, reproducing the reference AIFI's
    layout exactly (`transformer.py:79-96`, incl. its w-major flatten) so
    imported weights see identical activations. Returns [1, w*h, dim]."""
    assert dim % 4 == 0, "AIFI embed dim must be divisible by 4"
    grid_w, grid_h = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                                  jnp.arange(h, dtype=jnp.float32),
                                  indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temperature **
                   (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = grid_w.reshape(-1)[:, None] * omega[None]
    out_h = grid_h.reshape(-1)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w),
                            jnp.sin(out_h), jnp.cos(out_h)], axis=1)[None]


class AIFI(nn.Module):
    """RT-DETR intra-scale feature interaction: one post-norm transformer
    encoder layer over the flattened P5 map with 2D sin-cos positional
    embeddings (reference `AIFI`/`TransformerEncoderLayer`,
    `nn/modules/transformer.py:15-96`)."""

    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pos = sincos_pos_2d(W, H, C).astype(x.dtype)
        t = x.reshape(B, H * W, C)
        qk = t + pos
        attn = MultiHeadSelfAttention(C, self.num_heads, dtype=self.dtype,
                                      name="ma")(qk, qk, t)
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(t + attn)
        f = nn.Dense(self.cm, dtype=self.dtype, name="fc1")(t)
        f = nn.Dense(C, dtype=self.dtype, name="fc2")(nn.gelu(f))
        t = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(t + f)
        return t.reshape(B, H, W, C)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (reference `nn.Upsample(scale=2, 'nearest')`).

    Implemented as reshape+broadcast — compiles to a cheap layout op on TPU.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def concat(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Channel concat (reference `conv.py:Concat` with dim=1 in NCHW == axis -1 NHWC)."""
    return jnp.concatenate(xs, axis=-1)


class MLP(nn.Module):
    """Simple FFN head used by box/query heads (reference `transformer.py:MLP`)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x
