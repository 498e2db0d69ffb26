"""On-device letterbox + normalize (jit-fusable preprocessing).

Replaces the host-side resize/normalize of the reference predictor
(`engine/predictor.py:117-134` pre_transform + `data/augment.py:540-585`
LetterBox) with a device op that fuses into the jitted stream step: the
host ships RAW uint8 HWC frames (4x fewer PCIe bytes than float32), and
resize + pad + [0,1] normalization run on-chip.

Resize semantics: bilinear with half-pixel centers and no antialiasing —
cv2.resize(INTER_LINEAR), which is what the reference's LetterBox calls.
(The host fallback in `data/letterbox.py` uses PIL, which antialiases on
downscale; the two agree exactly on upscale and to ~1% on downscale.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def device_letterbox(img_u8: jnp.ndarray, out_hw: Tuple[int, int],
                     scale_fill: bool = True, pad_value: int = 114,
                     dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [B, h, w, 3] -> dtype [B, H, W, 3] in [0, 1].

    scale_fill=True stretches to (H, W) without preserving aspect (the
    reference track predictor's scaleFill mode, `predict.py:96-105`);
    False letterboxes: aspect-preserving resize + centered `pad_value`
    borders (reference LetterBox defaults). All shapes static -> one
    compile per source geometry, like the host path.

    dtype=jnp.uint8 keeps the output as a RAW letterboxed u8 frame (the
    cv2 semantics: integer letterbox, normalization deferred) — the
    backbone stem normalizes it itself with /255 folded into the conv
    kernel (`models/layers.py:_TapStem`), which avoids ever materializing
    a [B,H,W,3] float tensor in HBM (~20x the stem's bandwidth bound on
    TPU; scripts/stem_input_bench.py).
    """
    B, h, w, C = img_u8.shape
    H, W = out_hw
    as_u8 = dtype == jnp.uint8

    def finish(x):
        if as_u8:
            return jnp.clip(jnp.rint(x), 0, 255).astype(jnp.uint8)
        return (x * (1.0 / 255.0)).astype(dtype)

    if scale_fill or (h, w) == (H, W):
        if (h, w) == (H, W):
            return img_u8 if as_u8 else \
                (img_u8.astype(jnp.float32) * (1.0 / 255.0)).astype(dtype)
        x = jax.image.resize(img_u8.astype(jnp.float32), (B, H, W, C),
                             method="linear", antialias=False)
        return finish(x)
    gain = min(H / h, W / w)
    uh, uw = round(h * gain), round(w * gain)
    x = jax.image.resize(img_u8.astype(jnp.float32), (B, uh, uw, C),
                         method="linear", antialias=False)
    py, px = (H - uh) // 2, (W - uw) // 2
    x = jnp.pad(x, ((0, 0), (py, H - uh - py), (px, W - uw - px), (0, 0)),
                constant_values=float(pad_value))
    return finish(x)


def device_preprocess_meta(orig_hw: Tuple[int, int], out_hw: Tuple[int, int],
                           scale_fill: bool = True) -> dict:
    """The same rescale metadata the host `preprocess` returns, so
    `boxes_to_original` works identically on the device path."""
    h, w = orig_hw
    H, W = out_hw
    if scale_fill:
        return {"orig_shape": (h, w), "gain": (W / w, H / h),
                "pad": (0.0, 0.0), "input_shape": (H, W),
                "scale_fill": True}
    gain = min(H / h, W / w)
    uh, uw = round(h * gain), round(w * gain)
    return {"orig_shape": (h, w), "gain": (gain, gain),
            "pad": ((W - uw) // 2, (H - uh) // 2), "input_shape": (H, W),
            "scale_fill": False}
