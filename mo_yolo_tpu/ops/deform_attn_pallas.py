"""Fused multi-scale deformable attention — Pallas TPU kernel.

Replaces the reference's CUDA im2col sampler
(`MOTR/models/ops/src/cuda/ms_deform_im2col_cuda.cuh`, 1326 LoC of
scatter/gather) with an MXU-friendly formulation: bilinear sampling is
separable, so each (query, point) row builds two sparse interpolation
vectors (2 taps each along x and y) and the per-level gather becomes

    t[r, :]   = Cx[r, :] @ V_level[head]        (MXU matmul)
    s[r, d]   = sum_y Cy[r, y] * t[r, y, d]     (VPU reduce)

— no scattered memory access at all. Out-of-range taps simply match no
column, which reproduces `grid_sample(padding_mode='zeros')` exactly.

Layout: values are pre-transposed on the host (cheap fused XLA transposes)
to [B, heads, W_l, H_l*D] per level so each head's operand is a contiguous
matmul RHS in VMEM. The kernel tiles queries (TQ=64); levels and heads are
unrolled (static).

Backward: custom_vjp whose residual-free backward re-runs the pure-XLA
reference path's VJP (`mo_yolo_tpu.ops.deform_attn.ms_deform_attn_xla`) —
same split as the reference's CUDA-forward / autograd-checked backward
(`MOTR/models/ops/test.py` methodology).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mo_yolo_tpu.ops.deform_attn import ms_deform_attn_xla

TQ = 64  # query tile


def _kernel(shapes, H, D, P, loc_ref, attn_ref, *refs):
    """Reshape-free body (Mosaic cannot split/merge the lane dimension):
    every data movement is an iota-built one-hot matmul on the MXU. Heads
    run under a fori_loop (a python unroll blew VMEM with spill slots)."""
    v_refs, out_ref = refs[:-1], refs[-1]
    R = TQ * P
    # static point-sum matrix: out[q] = sum_p s[q*P + p]
    qr = jax.lax.broadcasted_iota(jnp.int32, (TQ, R), 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, (TQ, R), 1)
    psum_mat = (rr // P == qr).astype(jnp.float32)           # [TQ, R]

    def head_body(h, _):
        acc_h = jnp.zeros((TQ, D), jnp.float32)
        for l, (Hl, Wl) in enumerate(shapes):
            v = v_refs[l][0, h]                              # [Wl, Hl*D]
            # loc/attn arrive host-flattened to rows r = q*P + p
            x = loc_ref[0, :, h, l, 0:1] * Wl - 0.5          # [R, 1]
            y = loc_ref[0, :, h, l, 1:2] * Hl - 0.5
            aw = attn_ref[0, :, h, l][:, None]               # [R, 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = x - x0
            ty = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            # x-interp matrix with the attention weight folded in
            wi = jax.lax.broadcasted_iota(jnp.int32, (R, Wl), 1)
            cx = jnp.where(wi == x0i, 1.0 - tx, 0.0) + \
                jnp.where(wi == x0i + 1, tx, 0.0)            # [R, Wl]
            cx = cx * aw
            # y-interp mask expanded over lanes (y index = lane // D)
            yi = jax.lax.broadcasted_iota(jnp.int32, (R, Hl * D), 1) // D
            cyb = jnp.where(yi == y0i, 1.0 - ty, 0.0) + \
                jnp.where(yi == y0i + 1, ty, 0.0)            # [R, Hl*D]
            t = jnp.dot(cx.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)  # [R, Hl*D]
            t = t * cyb
            # y-sum: one-hot gather matrix G[y*D+d, d] = 1
            gr = jax.lax.broadcasted_iota(jnp.int32, (Hl * D, D), 0) % D
            gc = jax.lax.broadcasted_iota(jnp.int32, (Hl * D, D), 1)
            g = (gr == gc).astype(jnp.float32)
            s = jnp.dot(t, g, preferred_element_type=jnp.float32)  # [R, D]
            acc_h = acc_h + jnp.dot(psum_mat, s,
                                    preferred_element_type=jnp.float32)
        out_ref[0, h, :, :] = acc_h.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, H, head_body, 0)


def _forward(value, shapes, loc, attn):
    # sampling coordinates/weights in f32 regardless of network dtype:
    # bf16 coords lose sub-pixel precision AND change Mosaic's sublane
    # tiling (16 vs 8), breaking traced head-index alignment
    loc = loc.astype(jnp.float32)
    attn = attn.astype(jnp.float32)
    B, S, H, D = value.shape
    Q = loc.shape[1]
    L = len(shapes)
    P = loc.shape[4]

    # pre-transpose per level: [B, H, W_l, H_l*D]
    v_levels = []
    off = 0
    for (Hl, Wl) in shapes:
        v = jax.lax.dynamic_slice_in_dim(value, off, Hl * Wl, axis=1)
        off += Hl * Wl
        v = v.reshape(B, Hl, Wl, H, D).transpose(0, 3, 2, 1, 4)
        v_levels.append(v.reshape(B, H, Wl, Hl * D))

    qpad = -Q % TQ
    if qpad:
        loc = jnp.pad(loc, ((0, 0), (0, qpad), (0, 0), (0, 0), (0, 0), (0, 0)))
        attn = jnp.pad(attn, ((0, 0), (0, qpad), (0, 0), (0, 0), (0, 0)))
    Qp = Q + qpad

    # host-side flatten of (query, point) to rows r = q*P + p — the kernel
    # never reshapes (Mosaic cannot split/merge the lane dimension)
    loc = loc.transpose(0, 1, 4, 2, 3, 5).reshape(B, Qp * P, H, L, 2)
    attn = attn.transpose(0, 1, 4, 2, 3).reshape(B, Qp * P, H, L)

    grid = (B, Qp // TQ)
    in_specs = [
        pl.BlockSpec((1, TQ * P, H, L, 2), lambda b, q: (b, q, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ * P, H, L), lambda b, q: (b, q, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, H, Wl, Hl * D), lambda b, q: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for (Hl, Wl) in shapes
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, tuple(shapes), H, D, P),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, TQ, D), lambda b, q: (b, 0, q, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), value.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(loc, attn, *v_levels)
    # [B, H, Qp, D] -> [B, Q, H*D] (host-side, fused by XLA)
    return out.transpose(0, 2, 1, 3).reshape(B, Qp, H * D)[:, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, shapes, sampling_locations, attention_weights):
    """Drop-in for `ms_deform_attn_xla` (same shapes/semantics)."""
    return _forward(value, shapes, sampling_locations, attention_weights)


def _fwd(value, shapes, loc, attn):
    return _forward(value, shapes, loc, attn), (value, loc, attn)


def _bwd(shapes, res, g):
    value, loc, attn = res
    _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a),
                     value, loc, attn)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
