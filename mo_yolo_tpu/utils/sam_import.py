"""Official SAM checkpoint import (`sam_vit_b/l/h.pt` state_dicts).

The reference loads these via `torch.load` + `load_state_dict`
(`models/sam/build.py:105-112`). Here every torch key is mapped onto the
flax `SAMModel` param tree with the layout transposes TPU needs:
Linear [out,in] -> [in,out]; Conv [out,in,kh,kw] -> [kh,kw,in,out];
ConvTranspose [in,out,kh,kw] -> [kh,kw,in,out]; the five prompt token
embeddings collapse into the single `type_embed` table (pad/neg/pos/
box-tl/box-br — `encoders.py:145-148`).

`import_sam_torch_weights(variables, state_dict, strict=True)` returns a
new variables pytree; with strict=True every flax leaf must be matched
and every torch tensor consumed (buffers like `attention_bias_idxs` are
known-skips). TinyViT (mobile_sam.pt) import is not yet mapped.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _lin(w):       # torch Linear weight -> flax Dense kernel
    return np.asarray(w).T


def _conv(w):      # torch Conv2d weight -> flax Conv kernel
    return np.asarray(w).transpose(2, 3, 1, 0)


def _convT(w):     # torch ConvTranspose2d weight -> flax ConvTranspose
    return np.asarray(w).transpose(2, 3, 0, 1)


def _id(w):
    return np.asarray(w)


def _vit_rules(depth: int) -> Dict[Tuple[str, ...], Tuple[str, callable]]:
    """flax param path -> (torch key, transform)."""
    r: Dict[Tuple[str, ...], Tuple[str, callable]] = {}
    enc = "image_encoder"
    r[(enc, "patch_embed", "kernel")] = ("image_encoder.patch_embed.proj.weight", _conv)
    r[(enc, "patch_embed", "bias")] = ("image_encoder.patch_embed.proj.bias", _id)
    r[(enc, "pos_embed")] = ("image_encoder.pos_embed", _id)
    for i in range(depth):
        fb, tb = (enc, f"block{i}"), f"image_encoder.blocks.{i}"
        r[fb + ("norm1", "scale")] = (f"{tb}.norm1.weight", _id)
        r[fb + ("norm1", "bias")] = (f"{tb}.norm1.bias", _id)
        r[fb + ("attn", "qkv", "kernel")] = (f"{tb}.attn.qkv.weight", _lin)
        r[fb + ("attn", "qkv", "bias")] = (f"{tb}.attn.qkv.bias", _id)
        r[fb + ("attn", "proj", "kernel")] = (f"{tb}.attn.proj.weight", _lin)
        r[fb + ("attn", "proj", "bias")] = (f"{tb}.attn.proj.bias", _id)
        r[fb + ("attn", "rel_pos_h")] = (f"{tb}.attn.rel_pos_h", _id)
        r[fb + ("attn", "rel_pos_w")] = (f"{tb}.attn.rel_pos_w", _id)
        r[fb + ("norm2", "scale")] = (f"{tb}.norm2.weight", _id)
        r[fb + ("norm2", "bias")] = (f"{tb}.norm2.bias", _id)
        r[fb + ("mlp_lin1", "kernel")] = (f"{tb}.mlp.lin1.weight", _lin)
        r[fb + ("mlp_lin1", "bias")] = (f"{tb}.mlp.lin1.bias", _id)
        r[fb + ("mlp_lin2", "kernel")] = (f"{tb}.mlp.lin2.weight", _lin)
        r[fb + ("mlp_lin2", "bias")] = (f"{tb}.mlp.lin2.bias", _id)
    r[(enc, "neck0", "kernel")] = ("image_encoder.neck.0.weight", _conv)
    r[(enc, "neck_ln0", "scale")] = ("image_encoder.neck.1.weight", _id)
    r[(enc, "neck_ln0", "bias")] = ("image_encoder.neck.1.bias", _id)
    r[(enc, "neck1", "kernel")] = ("image_encoder.neck.2.weight", _conv)
    r[(enc, "neck_ln1", "scale")] = ("image_encoder.neck.3.weight", _id)
    r[(enc, "neck_ln1", "bias")] = ("image_encoder.neck.3.bias", _id)
    return r


def _prompt_rules() -> Dict[Tuple[str, ...], Tuple[str, callable]]:
    pe = "prompt_encoder"
    r = {
        (pe, "pe_gauss"): (
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
            _id),
        (pe, "no_mask_embed"): ("prompt_encoder.no_mask_embed.weight",
                                lambda w: np.asarray(w)[0]),
        (pe, "mask_conv1", "kernel"): (
            "prompt_encoder.mask_downscaling.0.weight", _conv),
        (pe, "mask_conv1", "bias"): (
            "prompt_encoder.mask_downscaling.0.bias", _id),
        (pe, "mask_ln1", "scale"): (
            "prompt_encoder.mask_downscaling.1.weight", _id),
        (pe, "mask_ln1", "bias"): (
            "prompt_encoder.mask_downscaling.1.bias", _id),
        (pe, "mask_conv2", "kernel"): (
            "prompt_encoder.mask_downscaling.3.weight", _conv),
        (pe, "mask_conv2", "bias"): (
            "prompt_encoder.mask_downscaling.3.bias", _id),
        (pe, "mask_ln2", "scale"): (
            "prompt_encoder.mask_downscaling.4.weight", _id),
        (pe, "mask_ln2", "bias"): (
            "prompt_encoder.mask_downscaling.4.bias", _id),
        (pe, "mask_conv3", "kernel"): (
            "prompt_encoder.mask_downscaling.6.weight", _conv),
        (pe, "mask_conv3", "bias"): (
            "prompt_encoder.mask_downscaling.6.bias", _id),
    }
    # type_embed rows: [not_a_point, neg(pt0), pos(pt1), box_tl(pt2),
    # box_br(pt3)] — handled specially in the importer (5 torch tables
    # -> one flax table)
    return r


def _decoder_rules(depth: int = 2, n_mask: int = 4
                   ) -> Dict[Tuple[str, ...], Tuple[str, callable]]:
    md, tmd = ("mask_decoder",), "mask_decoder"
    r: Dict[Tuple[str, ...], Tuple[str, callable]] = {
        md + ("iou_token",): (f"{tmd}.iou_token.weight",
                              lambda w: np.asarray(w)[0]),
        md + ("mask_tokens",): (f"{tmd}.mask_tokens.weight", _id),
        md + ("up1", "kernel"): (f"{tmd}.output_upscaling.0.weight", _convT),
        md + ("up1", "bias"): (f"{tmd}.output_upscaling.0.bias", _id),
        md + ("up_ln", "scale"): (f"{tmd}.output_upscaling.1.weight", _id),
        md + ("up_ln", "bias"): (f"{tmd}.output_upscaling.1.bias", _id),
        md + ("up2", "kernel"): (f"{tmd}.output_upscaling.3.weight", _convT),
        md + ("up2", "bias"): (f"{tmd}.output_upscaling.3.bias", _id),
    }

    def attn(flax_name: str, torch_name: str):
        for fp, tp in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                       ("out", "out_proj")):
            r[md + ("transformer", flax_name, fp, "kernel")] = (
                f"{tmd}.transformer.{torch_name}.{tp}.weight", _lin)
            r[md + ("transformer", flax_name, fp, "bias")] = (
                f"{tmd}.transformer.{torch_name}.{tp}.bias", _id)

    for i in range(depth):
        tl = f"layers.{i}"
        attn(f"self{i}", f"{tl}.self_attn")
        attn(f"t2i{i}", f"{tl}.cross_attn_token_to_image")
        attn(f"i2t{i}", f"{tl}.cross_attn_image_to_token")
        for fn, tn in ((f"n1_{i}", "norm1"), (f"n2_{i}", "norm2"),
                       (f"n3_{i}", "norm3"), (f"n4_{i}", "norm4")):
            r[md + ("transformer", fn, "scale")] = (
                f"{tmd}.transformer.{tl}.{tn}.weight", _id)
            r[md + ("transformer", fn, "bias")] = (
                f"{tmd}.transformer.{tl}.{tn}.bias", _id)
        r[md + ("transformer", f"mlp1_{i}", "kernel")] = (
            f"{tmd}.transformer.{tl}.mlp.lin1.weight", _lin)
        r[md + ("transformer", f"mlp1_{i}", "bias")] = (
            f"{tmd}.transformer.{tl}.mlp.lin1.bias", _id)
        r[md + ("transformer", f"mlp2_{i}", "kernel")] = (
            f"{tmd}.transformer.{tl}.mlp.lin2.weight", _lin)
        r[md + ("transformer", f"mlp2_{i}", "bias")] = (
            f"{tmd}.transformer.{tl}.mlp.lin2.bias", _id)
    attn("final", "final_attn_token_to_image")
    r[md + ("transformer", "n_final", "scale")] = (
        f"{tmd}.transformer.norm_final_attn.weight", _id)
    r[md + ("transformer", "n_final", "bias")] = (
        f"{tmd}.transformer.norm_final_attn.bias", _id)
    for i in range(n_mask):
        for j in range(3):
            r[md + (f"hyper{i}", f"layers{j}", "kernel")] = (
                f"{tmd}.output_hypernetworks_mlps.{i}.layers.{j}.weight",
                _lin)
            r[md + (f"hyper{i}", f"layers{j}", "bias")] = (
                f"{tmd}.output_hypernetworks_mlps.{i}.layers.{j}.bias", _id)
        # iou head shares layer count with hypernets (decoders.py:55)
    for j in range(3):
        r[md + ("iou_head", f"layers{j}", "kernel")] = (
            f"{tmd}.iou_prediction_head.layers.{j}.weight", _lin)
        r[md + ("iou_head", f"layers{j}", "bias")] = (
            f"{tmd}.iou_prediction_head.layers.{j}.bias", _id)
    return r


def _tiny_rules(depths=(2, 2, 6, 2)) -> Dict[Tuple[str, ...],
                                             Tuple[str, callable]]:
    """MobileSAM TinyViT encoder (`tiny_encoder.py`). Covers BOTH flax
    collections: Conv2d_BN maps c.weight -> c/kernel (params) and
    bn.{weight,bias,running_mean,running_var} -> bn/{scale,bias} (params)
    + bn/{mean,var} (batch_stats)."""
    r: Dict[Tuple[str, ...], Tuple[str, callable]] = {}
    enc = "image_encoder"

    def conv_bn(flax_prefix: Tuple[str, ...], torch_prefix: str):
        r[flax_prefix + ("c", "kernel")] = (f"{torch_prefix}.c.weight",
                                            _conv)
        r[flax_prefix + ("bn", "scale")] = (f"{torch_prefix}.bn.weight",
                                            _id)
        r[flax_prefix + ("bn", "bias")] = (f"{torch_prefix}.bn.bias", _id)
        r[flax_prefix + ("bn", "mean")] = (
            f"{torch_prefix}.bn.running_mean", _id)
        r[flax_prefix + ("bn", "var")] = (
            f"{torch_prefix}.bn.running_var", _id)

    conv_bn((enc, "patch0"), "image_encoder.patch_embed.seq.0")
    conv_bn((enc, "patch1"), "image_encoder.patch_embed.seq.2")
    for i in range(depths[0]):
        for c in ("conv1", "conv2", "conv3"):
            conv_bn((enc, f"s0_b{i}", c),
                    f"image_encoder.layers.0.blocks.{i}.{c}")
    for s in (1, 2, 3):
        tb = f"image_encoder.layers.{s}"
        for i in range(depths[s]):
            fb = (enc, f"s{s}_b{i}")
            r[fb + ("attn", "norm", "scale")] = (
                f"{tb}.blocks.{i}.attn.norm.weight", _id)
            r[fb + ("attn", "norm", "bias")] = (
                f"{tb}.blocks.{i}.attn.norm.bias", _id)
            r[fb + ("attn", "qkv", "kernel")] = (
                f"{tb}.blocks.{i}.attn.qkv.weight", _lin)
            r[fb + ("attn", "qkv", "bias")] = (
                f"{tb}.blocks.{i}.attn.qkv.bias", _id)
            r[fb + ("attn", "proj", "kernel")] = (
                f"{tb}.blocks.{i}.attn.proj.weight", _lin)
            r[fb + ("attn", "proj", "bias")] = (
                f"{tb}.blocks.{i}.attn.proj.bias", _id)
            r[fb + ("attn", "attention_biases")] = (
                f"{tb}.blocks.{i}.attn.attention_biases", _id)
            conv_bn(fb + ("local_conv",), f"{tb}.blocks.{i}.local_conv")
            r[fb + ("mlp_norm", "scale")] = (
                f"{tb}.blocks.{i}.mlp.norm.weight", _id)
            r[fb + ("mlp_norm", "bias")] = (
                f"{tb}.blocks.{i}.mlp.norm.bias", _id)
            r[fb + ("fc1", "kernel")] = (f"{tb}.blocks.{i}.mlp.fc1.weight",
                                         _lin)
            r[fb + ("fc1", "bias")] = (f"{tb}.blocks.{i}.mlp.fc1.bias", _id)
            r[fb + ("fc2", "kernel")] = (f"{tb}.blocks.{i}.mlp.fc2.weight",
                                         _lin)
            r[fb + ("fc2", "bias")] = (f"{tb}.blocks.{i}.mlp.fc2.bias", _id)
    # downsamplers live inside the PRECEDING torch layer
    for s, merge in ((0, "merge0"), (1, "merge1"), (2, "merge2")):
        for c in ("conv1", "conv2", "conv3"):
            conv_bn((enc, merge, c),
                    f"image_encoder.layers.{s}.downsample.{c}")
    r[(enc, "neck0", "kernel")] = ("image_encoder.neck.0.weight", _conv)
    r[(enc, "neck_ln0", "scale")] = ("image_encoder.neck.1.weight", _id)
    r[(enc, "neck_ln0", "bias")] = ("image_encoder.neck.1.bias", _id)
    r[(enc, "neck1", "kernel")] = ("image_encoder.neck.2.weight", _conv)
    r[(enc, "neck_ln1", "scale")] = ("image_encoder.neck.3.weight", _id)
    r[(enc, "neck_ln1", "bias")] = ("image_encoder.neck.3.bias", _id)
    return r


# torch-side tensors that have no flax counterpart (non-param buffers,
# TinyViT's unused classifier head)
_KNOWN_SKIPS = ("attention_bias_idxs", "pixel_mean", "pixel_std",
                "num_batches_tracked", "norm_head", "image_encoder.head.")


def import_sam_torch_weights(variables, state_dict, depth: int = 12,
                             strict: bool = True,
                             encoder: str = "vit"):
    """Map a torch SAM state_dict onto flax `SAMModel` variables
    (encoder='vit' for sam_vit_b/l/h, 'tiny' for mobile_sam).
    Returns new variables; raises on unmapped/missing keys when strict."""
    import jax

    rules = {}
    rules.update(_tiny_rules() if encoder == "tiny" else _vit_rules(depth))
    rules.update(_prompt_rules())
    rules.update(_decoder_rules())

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    # special: 5 single-row embeddings -> one [5, C] type table
    type_keys = ["prompt_encoder.not_a_point_embed.weight"] + [
        f"prompt_encoder.point_embeddings.{i}.weight" for i in range(4)]

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    missing = []
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", getattr(p, "name", None))
                     for p in path)
        keys = tuple(k for k in keys if k is not None)
        sub = keys[1:] if keys and keys[0] in ("params", "batch_stats") \
            else keys
        if sub == ("prompt_encoder", "type_embed"):
            if all(k in sd for k in type_keys):
                out[keys] = np.concatenate([sd[k] for k in type_keys], 0)
                used.update(type_keys)
            else:
                missing.append(sub)
            continue
        rule = rules.get(sub)
        if rule is None:
            missing.append(sub)
            continue
        tk, tf = rule
        if tk not in sd:
            missing.append(sub)
            continue
        w = tf(sd[tk])
        if tuple(w.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {sub}: torch {w.shape} "
                             f"vs flax {np.shape(leaf)}")
        out[keys] = w
        used.add(tk)

    unused = [k for k in sd if k not in used and
              not any(s in k for s in _KNOWN_SKIPS)]
    if strict and (missing or unused):
        raise ValueError(f"SAM import incomplete: {len(missing)} unmapped "
                         f"flax leaves {missing[:4]}..., {len(unused)} "
                         f"unused torch keys {unused[:4]}...")

    def rebuild(path, leaf):
        keys = tuple(getattr(p, "key", getattr(p, "name", None))
                     for p in path)
        keys = tuple(k for k in keys if k is not None)
        w = out.get(keys)
        return leaf if w is None else w.astype(np.asarray(leaf).dtype)

    return jax.tree_util.tree_map_with_path(rebuild, variables)
