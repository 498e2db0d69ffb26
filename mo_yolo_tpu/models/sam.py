"""SAM — promptable segmentation, TPU-native.

Re-design of the reference SAM family (`ultralytics/models/sam/`:
`modules/encoders.py` ImageEncoderViT/PromptEncoder, `modules/transformer.py`
TwoWayTransformer, `modules/decoders.py` MaskDecoder, `predict.py`
Predictor + everything-grid generator, `build.py` vit_b/l/h configs).

TPU-first choices (vs the reference's per-image Python loops and dynamic
prompt shapes):
- ONE static prompt layout: every prompt set is a fixed-length point
  tensor `[B, P, 2]` with integer labels `[B, P]` in {-1 pad, 0 neg,
  1 pos, 2 box-TL, 3 box-BR}. Boxes are folded into the point tensor as
  two labeled corner tokens (the reference routes them through separate
  embedding tables, `encoders.py:193-200` — same table indices here), so
  points/boxes/mixed prompts all compile to the same program.
- `embed` (ViT, O(image)) and `decode` (two-way transformer, O(prompts))
  are separate jitted steps: one image embedding is reused across any
  number of prompt batches — the everything-grid generator batches a
  whole point grid into a single decode call instead of the reference's
  chunked `for` loop (`amg.py:batch_iterator`).
- NHWC layout throughout; windowed attention is a static reshape to
  `[B*nW, ws*ws, C]`; decomposed relative positions are einsum'd
  (`encoders.py:516-551` semantics) with q_size==k_size static, so the
  interpolation path is never needed.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mo_yolo_tpu.models.layers import MLP

# prompt label codes (reference encoders.py:187-199 embedding table order)
PAD, NEG, POS, BOX_TL, BOX_BR = -1, 0, 1, 2, 3


# --------------------------------------------------------------------- #
# image encoder (ViTDet backbone, reference encoders.py:14-112)
# --------------------------------------------------------------------- #
class _RelAttention(nn.Module):
    """Global or windowed MHSA with decomposed relative positions."""

    dim: int
    num_heads: int
    size: int                      # tokens per side (window or full grid)
    use_rel_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):         # [B, s, s, C]
        B, s, _, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, s * s, 3, self.num_heads, hd)
        q, k, v = jnp.moveaxis(qkv, 2, 0)              # [B,N,H,hd] each
        q = jnp.swapaxes(q, 1, 2)                      # [B,H,N,hd]
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd ** -0.5), k)
        if self.use_rel_pos:
            # decomposed rel-pos (encoders.py:516-551): attn[q,k] +=
            # q·Rh[dy] + q·Rw[dx], gathered statically since q==k size.
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.size - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.size - 1, hd))
            idx = (jnp.arange(self.size)[:, None] -
                   jnp.arange(self.size)[None, :] + self.size - 1)
            Rh = rel_h[idx]                            # [s,s,hd]
            Rw = rel_w[idx]
            rq = q.reshape(B, self.num_heads, s, s, hd)
            bh = jnp.einsum("bnhwc,hkc->bnhwk", rq, Rh)
            bw = jnp.einsum("bnhwc,wkc->bnhwk", rq, Rw)
            attn = (attn.reshape(B, self.num_heads, s, s, s, s)
                    + bh[:, :, :, :, :, None] + bw[:, :, :, None, :]
                    ).reshape(B, self.num_heads, s * s, s * s)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, s, s, C)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class _ViTBlock(nn.Module):
    dim: int
    num_heads: int
    grid: int                      # full token grid side
    window: int = 0                # 0 = global attention
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):         # [B, g, g, C]
        B, g, _, C = x.shape
        h = nn.LayerNorm(name="norm1")(x)
        if self.window:
            w = self.window
            pad = (-g) % w
            gp = g + pad
            h = jnp.pad(h, ((0, 0), (0, pad), (0, pad), (0, 0)))
            h = h.reshape(B, gp // w, w, gp // w, w, C)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)
            h = _RelAttention(self.dim, self.num_heads, w,
                             dtype=self.dtype, name="attn")(h)
            h = h.reshape(B, gp // w, gp // w, w, w, C)
            h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B, gp, gp, C)
            h = h[:, :g, :g]
        else:
            h = _RelAttention(self.dim, self.num_heads, g,
                             dtype=self.dtype, name="attn")(h)
        x = x + h
        m = nn.LayerNorm(name="norm2")(x)
        m = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_lin1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.dim, dtype=self.dtype, name="mlp_lin2")(m)
        return x + m


class ImageEncoderViT(nn.Module):
    """Reference `encoders.py:ImageEncoderViT` re-layout in NHWC flax."""

    img_size: int = 1024
    patch: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images):    # [B,H,W,3] in [0,1] -> [B,g,g,256]
        # SAM pixel normalization (sam.py:41-44, ImageNet stats /255)
        mean = jnp.asarray([0.485, 0.456, 0.406], images.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], images.dtype)
        x = (images - mean) / std
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)
        g = self.img_size // self.patch
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.dim))
        x = x + pos
        for i in range(self.depth):
            x = _ViTBlock(self.dim, self.num_heads, grid=g,
                          window=0 if i in self.global_idx else self.window,
                          dtype=self.dtype, name=f"block{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                    dtype=self.dtype, name="neck0")(x)
        x = nn.LayerNorm(name="neck_ln0")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck1")(x)
        return nn.LayerNorm(name="neck_ln1")(x)


# --------------------------------------------------------------------- #
# prompt encoder (reference encoders.py:115-267)
# --------------------------------------------------------------------- #
class PromptEncoder(nn.Module):
    dim: int = 256
    grid: int = 64                 # image-embedding side
    img_size: int = 1024
    mask_chans: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        # random-fourier PE matrix (encoders.py:270-311); a param so
        # pretrained checkpoints restore it.
        self.pe_gauss = self.param("pe_gauss", nn.initializers.normal(1.0),
                                   (2, self.dim // 2))
        # 5 token type embeddings: not_a_point, neg, pos, box_tl, box_br
        self.type_embed = self.param("type_embed",
                                     nn.initializers.normal(1.0),
                                     (5, self.dim))
        self.no_mask_embed = self.param("no_mask_embed",
                                        nn.initializers.normal(1.0),
                                        (self.dim,))
        self.mask_conv1 = nn.Conv(self.mask_chans // 4, (2, 2),
                                  strides=(2, 2), dtype=self.dtype)
        self.mask_ln1 = nn.LayerNorm()
        self.mask_conv2 = nn.Conv(self.mask_chans, (2, 2), strides=(2, 2),
                                  dtype=self.dtype)
        self.mask_ln2 = nn.LayerNorm()
        self.mask_conv3 = nn.Conv(self.dim, (1, 1), dtype=self.dtype)

    def _pe(self, coords01):       # [...,2] in [0,1] -> [...,dim]
        c = (2.0 * coords01 - 1.0) @ self.pe_gauss * (2.0 * np.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def dense_pe(self):            # [grid,grid,dim]
        ax = (jnp.arange(self.grid, dtype=jnp.float32) + 0.5) / self.grid
        yy, xx = jnp.meshgrid(ax, ax, indexing="ij")
        return self._pe(jnp.stack([xx, yy], axis=-1))

    def __call__(self, points, labels, mask_input=None, has_mask=None):
        """points [B,P,2] px; labels [B,P] int; mask_input
        [B,4g,4g,1] or None; has_mask [B] bool gate. Returns
        (sparse [B,P,dim], dense [B,grid,grid,dim])."""
        pts = (points + 0.5) / jnp.asarray(
            [self.img_size, self.img_size], points.dtype)
        sparse = self._pe(pts)
        # pad tokens: PE zeroed, not_a_point embedding only
        sparse = jnp.where((labels == PAD)[..., None], 0.0, sparse)
        sparse = sparse + self.type_embed[jnp.clip(labels, -1, 3) + 1]
        B = points.shape[0]
        dense_no = jnp.broadcast_to(
            self.no_mask_embed, (B, self.grid, self.grid, self.dim))
        if mask_input is None:
            return sparse, dense_no
        m = nn.gelu(self.mask_ln1(self.mask_conv1(mask_input)),
                    approximate=False)
        m = nn.gelu(self.mask_ln2(self.mask_conv2(m)), approximate=False)
        m = self.mask_conv3(m)
        gate = has_mask.astype(m.dtype)[:, None, None, None]
        return sparse, gate * m + (1 - gate) * dense_no


# --------------------------------------------------------------------- #
# two-way transformer + mask decoder (transformer.py / decoders.py)
# --------------------------------------------------------------------- #
class _Attn(nn.Module):
    dim: int
    heads: int
    down: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.down
        hd = d // self.heads

        def split(x, name):
            x = nn.Dense(d, dtype=self.dtype, name=name)(x)
            return jnp.swapaxes(
                x.reshape(*x.shape[:-1], self.heads, hd), -3, -2)

        qh, kh, vh = split(q, "q"), split(k, "k"), split(v, "v")
        a = jax.nn.softmax(
            jnp.einsum("...qc,...kc->...qk", qh, kh) / math.sqrt(hd), -1)
        o = jnp.einsum("...qk,...kc->...qc", a, vh)
        o = jnp.swapaxes(o, -3, -2).reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(o)


class TwoWayTransformer(nn.Module):
    depth: int = 2
    dim: int = 256
    heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, img_pe, tokens):
        """img [B,N,dim], img_pe [B,N,dim], tokens [B,T,dim] ->
        (tokens, img)."""
        q, kv = tokens, img
        for i in range(self.depth):
            # 1) token self-attn; layer 0 skips PE and REPLACES queries
            # with the attention output (transformer.py:146-151)
            if i == 0:
                q = _Attn(self.dim, self.heads, dtype=self.dtype,
                          name=f"self{i}")(q, q, q)
            else:
                qq = q + tokens
                q = q + _Attn(self.dim, self.heads, dtype=self.dtype,
                              name=f"self{i}")(qq, qq, q)
            q = nn.LayerNorm(name=f"n1_{i}")(q)
            # 2) token -> image cross-attn
            q = q + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                          name=f"t2i{i}")(q + tokens, kv + img_pe, kv)
            q = nn.LayerNorm(name=f"n2_{i}")(q)
            # 3) mlp
            m = nn.Dense(self.mlp_dim, dtype=self.dtype,
                         name=f"mlp1_{i}")(q)
            q = q + nn.Dense(self.dim, dtype=self.dtype,
                             name=f"mlp2_{i}")(nn.relu(m))
            q = nn.LayerNorm(name=f"n3_{i}")(q)
            # 4) image -> token cross-attn
            kv = kv + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                            name=f"i2t{i}")(kv + img_pe, q + tokens, q)
            kv = nn.LayerNorm(name=f"n4_{i}")(kv)
        q = q + _Attn(self.dim, self.heads, 2, dtype=self.dtype,
                      name="final")(q + tokens, kv + img_pe, kv)
        return nn.LayerNorm(name="n_final")(q), kv


class MaskDecoder(nn.Module):
    dim: int = 256
    n_multimask: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        nm = self.n_multimask + 1
        self.iou_token = self.param("iou_token",
                                    nn.initializers.normal(1.0), (self.dim,))
        self.mask_tokens = self.param("mask_tokens",
                                      nn.initializers.normal(1.0),
                                      (nm, self.dim))
        self.transformer = TwoWayTransformer(dtype=self.dtype)
        self.up1 = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2),
                                    dtype=self.dtype)
        self.up_ln = nn.LayerNorm()
        self.up2 = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2),
                                    dtype=self.dtype)
        self.hyper = [MLP(self.dim, self.dim // 8, 3, name=f"hyper{i}")
                      for i in range(nm)]
        self.iou_head = MLP(self.dim, nm, 3, name="iou_head")

    def __call__(self, embedding, image_pe, sparse, dense):
        """embedding [g,g,dim] (ONE image), image_pe [g,g,dim], sparse
        [B,P,dim], dense [B,g,g,dim] -> (masks [B,4,4g,4g] logits,
        iou [B,4]); slot 0 is the single-mask output."""
        B = sparse.shape[0]
        g = embedding.shape[0]
        nm = self.n_multimask + 1
        out_tok = jnp.concatenate([self.iou_token[None],
                                   self.mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tok, (B, nm + 1, self.dim)), sparse], 1)
        src = embedding[None] + dense                    # [B,g,g,dim]
        pe = jnp.broadcast_to(image_pe[None], src.shape)
        hs, src = self.transformer(src.reshape(B, g * g, self.dim),
                                   pe.reshape(B, g * g, self.dim), tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + nm]                       # [B,nm,dim]
        up = src.reshape(B, g, g, self.dim)
        up = nn.gelu(self.up_ln(self.up1(up)), approximate=False)
        up = nn.gelu(self.up2(up), approximate=False)    # [B,4g,4g,dim/8]
        hyper = jnp.stack([self.hyper[i](mask_out[:, i])
                           for i in range(nm)], axis=1)  # [B,nm,dim/8]
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
        return masks, self.iou_head(iou_out)


# --------------------------------------------------------------------- #
# full model + API
# --------------------------------------------------------------------- #
class SAMModel(nn.Module):
    """`embed` once per image, `decode` per prompt batch (both jittable).

    encoder='vit' -> ImageEncoderViT (sam_b/l/h); encoder='tiny' ->
    TinyViT (MobileSAM, `build.py:55-64`). Both produce the same
    [B, img/16, img/16, 256] embedding, so prompt/mask decoding is
    identical."""

    img_size: int = 1024
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    window: int = 14
    encoder: str = "vit"
    dtype: Any = jnp.float32

    def setup(self):
        g = self.img_size // 16
        if self.encoder == "tiny":
            from mo_yolo_tpu.models.sam_tiny import TinyViT
            self.image_encoder = TinyViT(img_size=self.img_size,
                                         dtype=self.dtype)
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, dim=self.dim, depth=self.depth,
                num_heads=self.num_heads, global_idx=self.global_idx,
                window=self.window, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(grid=g, img_size=self.img_size,
                                            dtype=self.dtype)
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def __call__(self, images, points, labels):
        """Init/convenience path — exercises every submodule (incl. the
        mask-input downscaler) so `init` creates the full param tree."""
        emb = self.embed(images)
        g4 = (self.img_size // 16) * 4
        mask0 = jnp.zeros((points.shape[0], g4, g4, 1), images.dtype)
        return self.decode(emb[0], points, labels, mask0,
                           jnp.zeros((points.shape[0],), bool))

    def embed(self, images):
        return self.image_encoder(images)

    def decode(self, embedding, points, labels, mask_input=None,
               has_mask=None):
        sparse, dense = self.prompt_encoder(points, labels, mask_input,
                                            has_mask)
        return self.mask_decoder(embedding, self.prompt_encoder.dense_pe(),
                                 sparse, dense)


_VARIANTS = {   # build.py:22-53
    "b": dict(dim=768, depth=12, num_heads=12, global_idx=(2, 5, 8, 11)),
    "l": dict(dim=1024, depth=24, num_heads=16,
              global_idx=(5, 11, 17, 23)),
    "h": dict(dim=1280, depth=32, num_heads=16,
              global_idx=(7, 15, 23, 31)),
}


def build_sam(variant: str = "b", img_size: int = 1024,
              dtype=jnp.float32) -> SAMModel:
    v = variant.lower()
    if v.startswith("vit_"):
        v = v[len("vit_"):]
    if v in ("mobile", "mobile_sam", "t", "tiny"):
        return build_mobile_sam(img_size, dtype)
    return SAMModel(img_size=img_size, dtype=dtype, **_VARIANTS[v])


def build_mobile_sam(img_size: int = 1024, dtype=jnp.float32) -> SAMModel:
    """MobileSAM: TinyViT encoder + the standard SAM decoders."""
    return SAMModel(img_size=img_size, encoder="tiny", dtype=dtype)


class SAM:
    """Reference-shaped facade (`sam/model.py`): point/box prompts and an
    everything-grid generator."""

    def __init__(self, variant: str = "b", img_size: int = 1024,
                 dtype=jnp.float32, seed: int = 0, max_points: int = 8,
                 variables=None, **kw):
        self.model = build_sam(variant, img_size, dtype) if not kw else \
            SAMModel(img_size=img_size, dtype=dtype, **kw)
        self.img_size = img_size
        self.max_points = max_points
        if variables is None:
            g = img_size
            variables = self.model.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, g, g, 3)),
                jnp.zeros((1, max_points, 2)),
                jnp.full((1, max_points), PAD, jnp.int32))
        self.variables = variables
        self._embed = jax.jit(lambda v, x: self.model.apply(
            v, x, method=self.model.embed))
        self._decode = jax.jit(lambda v, e, p, l: self.model.apply(
            v, e, p, l, method=self.model.decode))
        self._emb_cache = None

    def load_torch(self, path: str, strict: bool = True):
        """Load an official `sam_vit_*.pt` checkpoint (reference
        `build.py:105-112`). Accepts a path or an in-memory state_dict."""
        from mo_yolo_tpu.utils.sam_import import import_sam_torch_weights
        sd = path
        if isinstance(path, str):
            import torch
            sd = torch.load(path, map_location="cpu")
            sd = sd.get("model", sd) if isinstance(sd, dict) else sd
            sd = {k: v.numpy() for k, v in sd.items()}
        self.variables = import_sam_torch_weights(
            self.variables, sd, depth=self.model.depth, strict=strict,
            encoder=self.model.encoder)
        self._emb_cache = None
        return self

    # -- prompt plumbing ------------------------------------------------ #
    def _pack(self, points, labels, boxes, meta=None):
        """-> [B,P,2] coords + [B,P] labels, one row per prompt set.

        With `meta` (from `embed_image`'s letterbox), user prompts given
        in ORIGINAL-image pixels are mapped into model-input pixels via
        coord*gain+pad — the reference Predictor applies the same resize
        transform to prompt coords (`sam/predict.py` prompt_inference)."""
        rows_p, rows_l = [], []
        if boxes is not None:
            for x0, y0, x1, y1 in np.asarray(boxes, float).reshape(-1, 4):
                rows_p.append([[x0, y0], [x1, y1]])
                rows_l.append([BOX_TL, BOX_BR])
        if points is not None:
            pts = np.asarray(points, float).reshape(-1, 2)
            lab = (np.ones(len(pts), int) if labels is None
                   else np.asarray(labels, int).reshape(-1))
            if rows_p:                       # merge points into each box row
                rows_p = [r + pts.tolist() for r in rows_p]
                rows_l = [r + lab.tolist() for r in rows_l]
            else:
                rows_p, rows_l = [pts.tolist()], [lab.tolist()]
        B = max(1, len(rows_p))
        P = self.max_points
        out_p = np.zeros((B, P, 2), np.float32)
        out_l = np.full((B, P), PAD, np.int32)
        for i, (rp, rl) in enumerate(zip(rows_p, rows_l)):
            n = min(P, len(rp))
            out_p[i, :n] = np.asarray(rp[:n], np.float32)
            out_l[i, :n] = np.asarray(rl[:n], np.int32)
        if meta is not None:
            if meta.get("scale_fill"):
                gx, gy = meta["gain"]
                px = py = 0.0
            else:
                gx = gy = meta["gain"][0]
                px, py = meta["pad"]
            real = out_l != PAD
            out_p[..., 0] = np.where(real, out_p[..., 0] * gx + px, 0.0)
            out_p[..., 1] = np.where(real, out_p[..., 1] * gy + py, 0.0)
        return out_p, out_l

    def embed_image(self, image: np.ndarray):
        from mo_yolo_tpu.data.letterbox import preprocess
        x, meta = preprocess(image, self.img_size, scale_fill=False)
        emb = self._embed(self.variables, jnp.asarray(x))[0]
        self._emb_cache = (emb, meta)
        return emb, meta

    def __call__(self, image=None, points=None, labels=None, bboxes=None,
                 multimask: bool = True):
        """-> dict(masks [B,4gx4g] bool at low-res, iou [B], best mask
        per prompt set upscaled to img_size)."""
        if image is not None:
            self.embed_image(image)
        emb, meta = self._emb_cache
        p, l = self._pack(points, labels, bboxes, meta=meta)
        masks, iou = self._decode(self.variables, emb, jnp.asarray(p),
                                  jnp.asarray(l))
        masks, iou = np.asarray(masks, np.float32), np.asarray(iou,
                                                               np.float32)
        if multimask:
            best = 1 + iou[:, 1:].argmax(axis=1)
        else:
            best = np.zeros(len(iou), int)
        sel = masks[np.arange(len(best)), best]          # [B,4g,4g]
        full = jax.image.resize(
            jnp.asarray(sel), (len(sel), self.img_size, self.img_size),
            "bilinear")
        return {"masks": np.asarray(full) > 0.0, "low_res": sel,
                "iou": iou[np.arange(len(best)), best], "meta": meta}

    def _grid_masks(self, image: np.ndarray, grid: int, iou_thresh: float,
                    stability_thresh: float):
        """Point-grid everything pass over ONE image/crop -> pre-NMS
        (masks [N,4g,4g] bool, scores [N])."""
        self.embed_image(image)
        emb, meta = self._emb_cache
        step = self.img_size / grid
        xs = (np.arange(grid) + 0.5) * step
        pts = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 1, 2)
        P = self.max_points
        p = np.zeros((grid * grid, P, 2), np.float32)
        l = np.full((grid * grid, P), PAD, np.int32)
        p[:, 0] = pts[:, 0]
        l[:, 0] = POS
        masks, iou = self._decode(self.variables, emb, jnp.asarray(p),
                                  jnp.asarray(l))
        masks = np.asarray(masks, np.float32)[:, 1:]     # multimask slots
        iou = np.asarray(iou, np.float32)[:, 1:]
        m = masks.reshape(-1, *masks.shape[2:])
        s = iou.reshape(-1)
        # stability = IoU between +eps/-eps thresholded masks (amg.py:90)
        hi = (m > 1.0).sum((1, 2)).astype(np.float32)
        lo = (m > -1.0).sum((1, 2)).astype(np.float32)
        stability = hi / np.maximum(lo, 1)
        keep = (s >= iou_thresh) & (stability >= stability_thresh)
        return m[keep] > 0, s[keep], meta

    def generate(self, image: np.ndarray, grid: int = 8,
                 iou_thresh: float = 0.7, stability_thresh: float = 0.9,
                 nms_iou: float = 0.7, crop_layers: int = 0,
                 crop_overlap: float = 0.25):
        """Everything mode (`predict.py:generate` / `amg.py`): a point
        grid decoded in ONE batched call per crop, stability-score
        filtered and mask-NMS'd on host. crop_layers>0 adds the
        reference's multi-crop sweep (`amg.py:generate_crop_boxes`):
        layer l runs the grid over (l+1)^2 overlapping crops for
        small-object recall, pasting crop masks back into the full
        low-res frame before the global NMS."""
        all_m, all_s = [], []
        m0, s0, meta = self._grid_masks(image, grid, iou_thresh,
                                        stability_thresh)
        all_m.append(m0)
        all_s.append(s0)
        H, W = image.shape[:2]
        g4 = m0.shape[-1] if len(m0) else (self.img_size // 16) * 4
        for layer in range(1, crop_layers + 1):
            n = layer + 1
            ch, cw = int(H / (n - (n - 1) * crop_overlap)), \
                int(W / (n - (n - 1) * crop_overlap))
            ys = np.linspace(0, H - ch, n).astype(int)
            xs = np.linspace(0, W - cw, n).astype(int)
            for y0 in ys:
                for x0 in xs:
                    crop = image[y0:y0 + ch, x0:x0 + cw]
                    cm, cs, _ = self._grid_masks(crop, grid, iou_thresh,
                                                 stability_thresh)
                    if not len(cm):
                        continue
                    # paste crop masks into full-frame low-res coords
                    fy0, fy1 = int(y0 / H * g4), int((y0 + ch) / H * g4)
                    fx0, fx1 = int(x0 / W * g4), int((x0 + cw) / W * g4)
                    tgt = (len(cm), max(fy1 - fy0, 1), max(fx1 - fx0, 1))
                    scaled = np.asarray(jax.image.resize(
                        jnp.asarray(cm, jnp.float32), tgt,
                        "nearest")) > 0.5
                    full = np.zeros((len(cm), g4, g4), bool)
                    full[:, fy0:fy0 + tgt[1], fx0:fx0 + tgt[2]] = scaled
                    all_m.append(full)
                    all_s.append(cs)
        m = np.concatenate(all_m) if all_m else np.zeros((0, g4, g4), bool)
        s = np.concatenate(all_s) if all_s else np.zeros(0)
        order = np.argsort(-s)
        kept = []
        for i in order:                                   # host mask-NMS
            ok = True
            for j in kept:
                inter = (m[i] & m[j]).sum()
                union = (m[i] | m[j]).sum()
                if union and inter / union > nms_iou:
                    ok = False
                    break
            if ok:
                kept.append(i)
        kept = np.asarray(kept, int)
        return {"masks": m[kept] if len(kept) else
                np.zeros((0,) + m.shape[1:], bool),
                "scores": s[kept] if len(kept) else np.zeros(0),
                "meta": meta}

    def text_prompt(self, image: np.ndarray, text: str, embedder=None,
                    grid: int = 8, **gen_kw):
        """Text-selected segmentation: everything-mode masks scored
        against `text` by the CLIP `retrieve` recipe (reference
        `fastsam/prompt.py:306-340,395-403`) behind the same pluggable
        `TextImageEmbedder` protocol as FastSAM. Returns the best mask
        (upscaled to original-image resolution) + per-mask text scores."""
        from mo_yolo_tpu.models.fastsam import clip_embedder, retrieve_scores

        out = self.generate(image, grid=grid, **gen_kw)
        if len(out["masks"]) == 0:
            return out
        if embedder is None:
            embedder = clip_embedder()
        meta = out["meta"]
        g = meta["gain"][0]
        px, py = meta["pad"]
        H, W = image.shape[:2]
        g4 = out["masks"].shape[-1]
        crops = []
        for mask in out["masks"]:
            ys, xs = np.nonzero(mask)
            if len(ys) == 0:
                crops.append(np.full_like(image, 255))
                continue
            # low-res mask coords -> model px -> original px
            sx = self.img_size / g4
            x1 = int(np.clip((xs.min() * sx - px) / g, 0, W - 1))
            x2 = int(np.clip(((xs.max() + 1) * sx - px) / g, x1 + 1, W))
            y1 = int(np.clip((ys.min() * sx - py) / g, 0, H - 1))
            y2 = int(np.clip(((ys.max() + 1) * sx - py) / g, y1 + 1, H))
            canvas = np.full_like(image, 255)
            canvas[y1:y2, x1:x2] = image[y1:y2, x1:x2]
            crops.append(canvas)
        scores = retrieve_scores(crops, text, embedder)
        best = int(np.argmax(scores))
        return {"masks": out["masks"][best:best + 1],
                "scores": out["scores"][best:best + 1],
                "text_scores": scores, "meta": meta}
