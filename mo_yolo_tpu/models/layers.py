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

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


def autopad(k: int, d: int = 1) -> int:
    """'same' padding for odd kernels (reference `conv.py:autopad`)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2


class ConvBnAct(nn.Module):
    """Conv2D + BatchNorm + SiLU (the reference's `Conv` primitive).

    At inference the BN can be folded into the conv (`fuse`), mirroring
    `nn/tasks.py:122-147`; under XLA the unfused form compiles to the same
    fused HLO so we keep BN explicit and rely on `use_running_average`.
    """

    filters: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.kernel, self.dilation)
        x = nn.Conv(self.filters, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        if self.act:
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
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBnAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        k = self.kernel
        pad = k // 2
        outs = [y]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (k, k), strides=(1, 1),
                                    padding=((pad, pad), (pad, pad))))
        y = jnp.concatenate(outs, axis=-1)
        return ConvBnAct(self.filters, 1, dtype=self.dtype, name="cv2")(y, train)


class DWConv(nn.Module):
    """Depthwise Conv+BN+SiLU (reference `conv.py:DWConv`)."""

    filters: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = _gcd(x.shape[-1], self.filters)
        return ConvBnAct(self.filters, self.kernel, self.stride, groups=g,
                         dtype=self.dtype, name="conv")(x, train)


def _gcd(a: int, b: int) -> int:
    while b:
        a, b = b, a % b
    return a


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
