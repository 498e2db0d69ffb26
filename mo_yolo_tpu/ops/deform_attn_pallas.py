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

Backward: a fused Pallas VJP kernel (same one-hot-MXU formulation run in
reverse — the TPU equivalent of the reference's `ms_deformable_col2im`
CUDA kernels): d_value accumulates as Cx^T @ (dU * Cy) matmuls across
query tiles, and d_loc/d_attn reduce per-row against the interpolation
selectors. Parity + grad checks vs the pure-XLA oracle follow the
reference's methodology (`MOTR/models/ops/test.py:32-83`). Set
`MO_YOLO_DEFORM_BWD=xla` to fall back to the oracle's XLA VJP.
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


def _bwd_kernel(shapes, H, D, P, loc_ref, attn_ref, g_ref, *refs):
    """Reverse of `_kernel`, same reshape-free one-hot-MXU style.

    Per (level, head):  forward was  t = (CxW ∘ aw) @ V ;  u = t ∘ Cy ;
    s = u @ G ;  out = Psum @ s.   Given g = d out:
      ds   = Psum^T @ g                (rows r get g[r // P])
      du   = ds @ E                    (E[d, y*D+d'] = [d'==d])
      dt   = du ∘ Cy ;    dCy = du ∘ t     (t recomputed: one matmul)
      dV  += Cx^T @ dt                 (accumulated across query tiles)
      dCx  = dt @ V^T
      d_aw = Σ_w dCx ∘ CxW ;  d_tx = Σ_w dCx ∘ aw ∘ (S⁺x − S⁻x) ; dx = d_tx·Wl
      d_ty = Σ_c dCy ∘ (S⁺y − S⁻y) ;  dy = d_ty·Hl
    """
    q_idx = pl.program_id(1)
    L = len(shapes)
    v_refs = refs[:L]
    dmeta_ref = refs[L]
    dv_refs = refs[L + 1:]
    R = TQ * P

    @pl.when(q_idx == 0)
    def _init():
        for l in range(L):
            dv_refs[l][...] = jnp.zeros_like(dv_refs[l])

    # ds rows: one-hot expand [TQ, D] -> [R, D] with row r taking q = r//P
    rr = jax.lax.broadcasted_iota(jnp.int32, (R, TQ), 0)
    qq = jax.lax.broadcasted_iota(jnp.int32, (R, TQ), 1)
    expand_mat = (rr // P == qq).astype(jnp.float32)          # [R, TQ]

    def head_body(h, _):
        gq = g_ref[0, h].astype(jnp.float32)                  # [TQ, D]
        ds = jnp.dot(expand_mat, gq,
                     preferred_element_type=jnp.float32)      # [R, D]
        dmeta_blocks = []
        for l, (Hl, Wl) in enumerate(shapes):
            v = v_refs[l][0, h].astype(jnp.float32)           # [Wl, Hl*D]
            x = loc_ref[0, :, h, l, 0:1] * Wl - 0.5           # [R, 1]
            y = loc_ref[0, :, h, l, 1:2] * Hl - 0.5
            aw = attn_ref[0, :, h, l][:, None]                # [R, 1]
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = x - x0
            ty = y - y0
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            wi = jax.lax.broadcasted_iota(jnp.int32, (R, Wl), 1)
            sel_x0 = (wi == x0i).astype(jnp.float32)
            sel_x1 = (wi == x0i + 1).astype(jnp.float32)
            cxw = sel_x0 * (1.0 - tx) + sel_x1 * tx           # [R, Wl]
            cx = cxw * aw
            yi = jax.lax.broadcasted_iota(jnp.int32, (R, Hl * D), 1) // D
            sel_y0 = (yi == y0i).astype(jnp.float32)
            sel_y1 = (yi == y0i + 1).astype(jnp.float32)
            cyb = sel_y0 * (1.0 - ty) + sel_y1 * ty           # [R, Hl*D]
            # du[r, y*D+d] = ds[r, d]
            er = jax.lax.broadcasted_iota(jnp.int32, (D, Hl * D), 0)
            ec = jax.lax.broadcasted_iota(jnp.int32, (D, Hl * D), 1) % D
            e_mat = (er == ec).astype(jnp.float32)
            du = jnp.dot(ds, e_mat,
                         preferred_element_type=jnp.float32)  # [R, Hl*D]
            dt = du * cyb
            t = jnp.dot(cx, v, preferred_element_type=jnp.float32)
            d_cyb = du * t
            d_ty = jnp.sum(d_cyb * (sel_y1 - sel_y0), axis=1,
                           keepdims=True)                     # [R, 1]
            # dV += Cx^T @ dt  (contract over rows, no explicit transpose)
            dv = jax.lax.dot_general(
                cx, dt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [Wl, Hl*D]
            dv_refs[l][0, h] += dv.astype(dv_refs[l].dtype)
            # dCx = dt @ V^T (contract over lanes of both)
            d_cx = jax.lax.dot_general(
                dt, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [R, Wl]
            d_aw = jnp.sum(d_cx * cxw, axis=1, keepdims=True)
            d_tx = jnp.sum(d_cx * aw * (sel_x1 - sel_x0), axis=1,
                           keepdims=True)
            dmeta_blocks.append(jnp.concatenate(
                [d_tx * Wl, d_ty * Hl, d_aw,
                 jnp.zeros((R, 1), jnp.float32)], axis=1))    # [R, 4]
        dmeta_ref[0, h] = jnp.concatenate(dmeta_blocks, axis=1)
        return 0

    jax.lax.fori_loop(0, H, head_body, 0)


def _backward(value, shapes, loc, attn, g):
    """Fused VJP: returns (d_value, d_loc, d_attn) matching the oracle."""
    in_dtype = value.dtype
    loc32 = loc.astype(jnp.float32)
    attn32 = attn.astype(jnp.float32)
    B, S, H, D = value.shape
    Q = loc.shape[1]
    L = len(shapes)
    P = loc.shape[4]

    v_levels = []
    off = 0
    for (Hl, Wl) in shapes:
        v = jax.lax.dynamic_slice_in_dim(value, off, Hl * Wl, axis=1)
        off += Hl * Wl
        v = v.reshape(B, Hl, Wl, H, D).transpose(0, 3, 2, 1, 4)
        v_levels.append(v.reshape(B, H, Wl, Hl * D))

    qpad = -Q % TQ
    locp = loc32
    attnp = attn32
    gp = g.astype(jnp.float32)
    if qpad:
        locp = jnp.pad(locp, ((0, 0), (0, qpad), (0, 0), (0, 0), (0, 0),
                              (0, 0)))
        attnp = jnp.pad(attnp, ((0, 0), (0, qpad), (0, 0), (0, 0), (0, 0)))
        gp = jnp.pad(gp, ((0, 0), (0, qpad), (0, 0)))
    Qp = Q + qpad
    locp = locp.transpose(0, 1, 4, 2, 3, 5).reshape(B, Qp * P, H, L, 2)
    attnp = attnp.transpose(0, 1, 4, 2, 3).reshape(B, Qp * P, H, L)
    gp = gp.reshape(B, Qp, H, D).transpose(0, 2, 1, 3)        # [B, H, Qp, D]

    grid = (B, Qp // TQ)
    in_specs = [
        pl.BlockSpec((1, TQ * P, H, L, 2), lambda b, q: (b, q, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TQ * P, H, L), lambda b, q: (b, q, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, TQ, D), lambda b, q: (b, 0, q, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, H, Wl, Hl * D), lambda b, q: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for (Hl, Wl) in shapes
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H, Qp * P, 4 * L), jnp.float32)] + [
        jax.ShapeDtypeStruct((B, H, Wl, Hl * D), jnp.float32)
        for (Hl, Wl) in shapes
    ]
    out_specs = [
        pl.BlockSpec((1, H, TQ * P, 4 * L), lambda b, q: (b, 0, q, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((1, H, Wl, Hl * D), lambda b, q: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for (Hl, Wl) in shapes
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, tuple(shapes), H, D, P),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(locp, attnp, gp, *v_levels)
    dmeta, dv_levels = outs[0], outs[1:]

    # dmeta [B, H, R, 4L] -> d_loc [B, Q, H, L, P, 2], d_attn [B, Q, H, L, P]
    dmeta = dmeta.reshape(B, H, Qp, P, L, 4).transpose(0, 2, 1, 4, 3, 5)
    d_loc = dmeta[:, :Q, ..., 0:2]                            # [B,Q,H,L,P,2]
    d_attn = dmeta[:, :Q, ..., 2]                             # [B,Q,H,L,P]

    # dv levels [B, H, Wl, Hl*D] -> d_value [B, S, H, D]
    parts = []
    for (Hl, Wl), dv in zip(shapes, dv_levels):
        dv = dv.reshape(B, H, Wl, Hl, D).transpose(0, 3, 2, 1, 4)
        parts.append(dv.reshape(B, Hl * Wl, H, D))
    d_value = jnp.concatenate(parts, axis=1).astype(in_dtype)
    return d_value, d_loc.astype(loc.dtype), d_attn.astype(attn.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, shapes, sampling_locations, attention_weights):
    """Drop-in for `ms_deform_attn_xla` (same shapes/semantics)."""
    return _forward(value, shapes, sampling_locations, attention_weights)


def _fwd(value, shapes, loc, attn):
    return _forward(value, shapes, loc, attn), (value, loc, attn)


def _bwd(shapes, res, g):
    import os
    value, loc, attn = res
    if os.environ.get("MO_YOLO_DEFORM_BWD", "pallas") == "xla":
        _, vjp = jax.vjp(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a),
                         value, loc, attn)
        return vjp(g)
    return _backward(value, shapes, loc, attn, g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
