"""Loss + denoising unit tests (fast, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mo_yolo_tpu.train.losses import LossConfig, dn_losses, layer_loss
from mo_yolo_tpu.ops.denoising import build_cdn_group, cdn_attn_mask


def _setup(perfect: bool):
    B, Q, G, nc = 2, 8, 3, 4
    rng = np.random.default_rng(0)
    gt_boxes = rng.uniform(0.3, 0.6, (B, G, 4)).astype(np.float32)
    gt_cls = rng.integers(0, nc, (B, G)).astype(np.int32)
    gt_mask = np.ones((B, G), bool)
    gt_mask[1, 2] = False
    assign = np.tile(np.array([0, 3, 5], np.int32), (B, 1))
    pred_boxes = rng.uniform(0.2, 0.7, (B, Q, 4)).astype(np.float32)
    pred_logits = np.full((B, Q, nc), -4.0, np.float32)
    if perfect:
        for b in range(B):
            for g in range(G):
                if gt_mask[b, g]:
                    pred_boxes[b, assign[b, g]] = gt_boxes[b, g]
                    pred_logits[b, assign[b, g], gt_cls[b, g]] = 8.0
    return (jnp.asarray(pred_boxes), jnp.asarray(pred_logits),
            jnp.asarray(gt_boxes), jnp.asarray(gt_cls), jnp.asarray(gt_mask),
            jnp.asarray(assign))


def test_layer_loss_perfect_lower_than_random():
    cfg = LossConfig(nc=4)
    good = layer_loss(cfg, *_setup(True))
    bad = layer_loss(cfg, *_setup(False))
    assert float(good["loss_bbox"]) < 1e-3
    assert float(good["loss_giou"]) < 1e-3
    assert float(good["loss_class"]) < float(bad["loss_class"])
    assert float(bad["loss_bbox"]) > 0.1
    assert int(good["num_gts"]) == 5  # 6 padded to 5 by mask


def test_layer_loss_padding_excluded():
    cfg = LossConfig(nc=4)
    pb, pl, gb, gc, gm, a = _setup(True)
    # turning all GT off zeroes regression losses
    out = layer_loss(cfg, pb, pl, gb, gc, jnp.zeros_like(gm), a)
    assert float(out["loss_bbox"]) == 0.0
    assert float(out["loss_giou"]) == 0.0


def test_layer_loss_grads_finite():
    cfg = LossConfig(nc=4)
    pb, pl, gb, gc, gm, a = _setup(False)

    def f(pb, pl):
        o = layer_loss(cfg, pb, pl, gb, gc, gm, a)
        return o["loss_class"] + o["loss_bbox"] + o["loss_giou"]

    g1, g2 = jax.grad(f, argnums=(0, 1))(pb, pl)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_cdn_group_shapes_and_mask():
    key = jax.random.PRNGKey(0)
    B, G, nc, n_main = 2, 5, 3, 20
    gt_cls = jnp.zeros((B, G), jnp.int32)
    gt_boxes = jnp.full((B, G, 4), 0.5)
    gt_mask = jnp.ones((B, G), bool)
    cdn = build_cdn_group(key, gt_cls, gt_boxes, gt_mask, nc, n_main,
                          num_denoising=20)
    ng = max(1, 20 // G)  # 4 groups
    assert cdn.num_group == ng
    assert cdn.num_dn == 2 * ng * G
    qt = cdn.num_dn + n_main
    assert cdn.attn_mask.shape == (qt, qt)
    m = np.asarray(cdn.attn_mask)
    nd = cdn.num_dn
    # main->main visible; main->dn blocked; dn->main visible
    assert not m[nd:, nd:].any()
    assert m[nd:, :nd].all()
    assert not m[:nd, nd:].any()
    # dn group blocks: first group sees itself, not second group
    gsz = nd // ng
    assert not m[:gsz, :gsz].any()
    assert m[:gsz, gsz:2 * gsz].all()
    # noised boxes are in logit space of valid coords (finite)
    assert np.isfinite(np.asarray(cdn.dn_bbox_logit)).all()


def test_dn_losses_positive_indices():
    cfg = LossConfig(nc=3)
    B, G, ng = 1, 2, 2
    ndn = 2 * ng * G
    L = 2
    gt_boxes = jnp.asarray([[[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]]])
    gt_cls = jnp.asarray([[1, 2]], jnp.int32)
    gt_mask = jnp.ones((B, G), bool)
    # perfect dn predictions at the positive slots
    dn_boxes = jnp.zeros((L, B, ndn, 4))
    dn_logits = jnp.full((L, B, ndn, 3), -8.0)
    for k in range(ng):
        for g in range(G):
            idx = 2 * k * G + g
            dn_boxes = dn_boxes.at[:, 0, idx].set(gt_boxes[0, g])
            dn_logits = dn_logits.at[:, 0, idx, gt_cls[0, g]].set(8.0)
    out = dn_losses(cfg, dn_boxes, dn_logits, gt_boxes, gt_cls, gt_mask, ng)
    assert float(out["loss_bbox_dn"]) < 1e-3
    assert float(out["loss_giou_dn"]) < 1e-2
