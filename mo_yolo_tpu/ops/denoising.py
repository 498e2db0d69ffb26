"""Contrastive denoising (CDN) query groups — static-shape version.

Reference: `get_cdn_group` / `get_track_cdn_group`
(`ultralytics/models/utils/ops.py:143-382`): 2*num_group noisy copies of the
GT set (class flip p = label_noise_ratio/2, box jitter; negatives shifted by
at least one box extent), padded class/box embeddings, and the block
attention mask over [dn | track | detect] queries.

TPU-first redesign: the reference sizes the dn set from the *runtime* max
GT count in the batch; here GT is padded to a static `max_gt` and the group
count is `max(1, num_denoising // max_gt)` computed at trace time, so every
shape is static. Padded GT rows still occupy dn slots (as in the reference's
padding) but are excluded from the dn loss via the gt mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.boxes import xywh2xyxy, xyxy2xywh
from mo_yolo_tpu.ops.embed import inverse_sigmoid


class CDNGroup(NamedTuple):
    dn_cls: jnp.ndarray        # [B, Ndn] int32 (possibly flipped labels)
    dn_bbox_logit: jnp.ndarray  # [B, Ndn, 4] jittered boxes, logit space
    attn_mask: jnp.ndarray     # [Qt, Qt] bool, True = blocked
    num_group: int
    num_dn: int                # Ndn = 2 * num_group * max_gt


def cdn_attn_mask(num_dn: int, num_group: int, n_main: int) -> jnp.ndarray:
    """Block mask over [dn | main] queries (main = track+detect).

    dn group i sees only itself; main queries never see dn
    (reference `models/utils/ops.py:363-379`). True = blocked.
    """
    qt = num_dn + n_main
    gsz = num_dn // num_group  # = 2 * max_gt
    gid = jnp.arange(qt) // gsz
    gid = jnp.where(jnp.arange(qt) >= num_dn, num_group, gid)  # main block
    # blocked unless same group; main-main always allowed
    same = gid[:, None] == gid[None, :]
    main = (jnp.arange(qt) >= num_dn)
    allowed = same | (main[:, None] & main[None, :])
    # dn queries may attend main (reference masks dn->later-groups and
    # main->dn; dn->main stays visible)
    allowed = allowed | (~main[:, None] & main[None, :])
    return ~allowed


def build_cdn_group(key: jax.Array,
                    gt_cls: jnp.ndarray,      # [B, G] int32
                    gt_bbox: jnp.ndarray,     # [B, G, 4] cxcywh in [0,1]
                    gt_mask: jnp.ndarray,     # [B, G] bool
                    nc: int,
                    n_main: int,              # n_track + nq
                    num_denoising: int = 100,
                    label_noise_ratio: float = 0.5,
                    box_noise_scale: float = 1.0) -> CDNGroup:
    """Build the static-shape CDN group for one clip frame."""
    B, G = gt_cls.shape
    num_group = max(1, num_denoising // max(G, 1))
    num_dn = 2 * num_group * G

    kcls, ksign, kpart, kflip = jax.random.split(key, 4)

    # tile GT over 2*num_group copies; layout per group: [pos(G) | neg(G)]
    reps = 2 * num_group
    cls_t = jnp.tile(gt_cls, (1, reps))                     # [B, Ndn]
    bbox_t = jnp.tile(gt_bbox, (1, reps, 1))                # [B, Ndn, 4]
    # negative half of each group
    block = jnp.arange(num_dn) // G                         # 0..2*num_group-1
    is_neg = (block % 2 == 1)[None, :]                      # [1, Ndn]

    # label flip with p = ratio/2 (reference `ops.py:200-206`)
    flip = jax.random.uniform(kflip, (B, num_dn)) < (label_noise_ratio * 0.5)
    rand_cls = jax.random.randint(kcls, (B, num_dn), 0, nc)
    dn_cls = jnp.where(flip, rand_cls, cls_t).astype(jnp.int32)

    # box jitter (reference `ops.py:208-219`): corners shifted by
    # sign * part * (wh/2) * scale; negatives use part in (1, 2]
    if box_noise_scale > 0:
        xyxy = xywh2xyxy(bbox_t)
        diff = jnp.concatenate([bbox_t[..., 2:] * 0.5, bbox_t[..., 2:] * 0.5],
                               axis=-1)                      # [B, Ndn, 4]
        sign = jnp.where(jax.random.uniform(ksign, xyxy.shape) < 0.5, -1.0, 1.0)
        part = jax.random.uniform(kpart, xyxy.shape)
        part = jnp.where(is_neg[..., None], part + 1.0, part)
        xyxy = xyxy + sign * part * diff * box_noise_scale
        xyxy = jnp.clip(xyxy, 0.0, 1.0)
        bbox_t = xyxy2xywh(xyxy)
    dn_bbox_logit = inverse_sigmoid(bbox_t)

    mask = cdn_attn_mask(num_dn, num_group, n_main)
    return CDNGroup(dn_cls=dn_cls, dn_bbox_logit=dn_bbox_logit,
                    attn_mask=mask, num_group=num_group, num_dn=num_dn)


def dn_positive_index(num_group: int, G: int) -> jnp.ndarray:
    """Query index of the positive dn copy of GT g in group k:
    idx = (2k) * G + g. Returns [num_group, G] (reference
    `get_dn_match_indices`, `loss.py:726-748`, realized as index math)."""
    k = jnp.arange(num_group)[:, None]
    g = jnp.arange(G)[None, :]
    return 2 * k * G + g
