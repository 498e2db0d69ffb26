"""TAL assigner + v8 detection loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mo_yolo_tpu.train.v8_loss import (
    V8LossConfig, task_aligned_assign, v8_detection_loss)


def _grid(S=64, stride=8.0):
    n = int(np.sqrt(S))
    gy, gx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    anc = np.stack([gx + 0.5, gy + 0.5], -1).reshape(-1, 2).astype(np.float32)
    return jnp.asarray(anc), jnp.full((S,), stride)


def test_assigner_picks_anchors_inside_gt():
    cfg = V8LossConfig(nc=3)
    S = 64
    anc, strides = _grid(S)
    anc_px = anc * 8.0
    B, G = 1, 1
    gt_boxes = jnp.asarray([[[8.0, 8.0, 32.0, 32.0]]])  # covers cells (1..3)^2
    gt_labels = jnp.asarray([[1]], jnp.int32)
    gt_mask = jnp.ones((B, G), bool)
    # predictions: perfect box everywhere, high class-1 score
    pd_boxes = jnp.broadcast_to(gt_boxes[:, 0:1], (B, S, 4))
    pd_scores = jnp.full((B, S, 3), 0.01).at[..., 1].set(0.9)
    tl, tb, ts, fg = task_aligned_assign(cfg, pd_scores, pd_boxes, anc_px,
                                         gt_labels, gt_boxes, gt_mask)
    fg_np = np.asarray(fg[0])
    assert fg_np.sum() > 0
    # every fg anchor center lies inside the GT box
    centers = np.asarray(anc_px)[fg_np]
    assert (centers > 8).all() and (centers < 32).all()
    # targets carry the GT label and box
    assert (np.asarray(tl[0])[fg_np] == 1).all()
    np.testing.assert_allclose(
        np.asarray(tb[0])[fg_np],
        np.broadcast_to(np.asarray(gt_boxes[0, 0]), (int(fg_np.sum()), 4)),
        atol=1e-5)


def test_assigner_respects_mask():
    cfg = V8LossConfig(nc=2)
    anc, strides = _grid(64)
    B, G, S = 1, 2, 64
    gt_boxes = jnp.asarray([[[8, 8, 32, 32], [40, 40, 60, 60]]], jnp.float32)
    gt_labels = jnp.zeros((B, G), jnp.int32)
    gt_mask = jnp.asarray([[True, False]])
    pd_boxes = jnp.broadcast_to(jnp.asarray([20., 20., 30., 30.]), (B, S, 4))
    pd_scores = jnp.full((B, S, 2), 0.5)
    _, _, _, fg = task_aligned_assign(cfg, pd_scores, pd_boxes, anc * 8.0,
                                      gt_labels, gt_boxes, gt_mask)
    centers = np.asarray(anc * 8.0)[np.asarray(fg[0])]
    # no anchor assigned to the masked GT region
    assert not ((centers > 40) & (centers < 60)).all(-1).any()


def test_v8_loss_better_predictions_lower_loss():
    cfg = V8LossConfig(nc=2)
    anc, strides = _grid(64)
    B, S, R = 1, 64, 16
    # GT chosen so anchor-to-edge distances are INTEGRAL in cells (anchors
    # sit at k+0.5; edges at 1.5/5.5 cells) -> DFL peaks decode exactly
    gt_boxes = jnp.asarray([[[12.0, 12.0, 44.0, 44.0]]])
    gt_labels = jnp.asarray([[0]], jnp.int32)
    gt_mask = jnp.ones((1, 1), bool)
    rng = np.random.default_rng(0)
    bad_dist = jnp.asarray(rng.standard_normal((B, S, 4, R)).astype(np.float32))
    bad_cls = jnp.zeros((B, S, 2))
    # good: DFL peaked at the true cell distances, confident class
    good_dist = jnp.full((B, S, 4, R), -6.0)
    anc_np = np.asarray(anc)
    tgt = np.stack([anc_np[:, 0] - 1.5, anc_np[:, 1] - 1.5,
                    5.5 - anc_np[:, 0], 5.5 - anc_np[:, 1]], -1)
    tgt = np.clip(np.round(tgt), 0, R - 1).astype(int)
    ii = np.arange(S)
    gd = np.full((B, S, 4, R), -6.0, np.float32)
    for k in range(4):
        gd[0, ii, k, tgt[:, k]] = 6.0
    good_dist = jnp.asarray(gd)
    good_cls = jnp.full((B, S, 2), -6.0).at[..., 0].set(4.0)

    bad = v8_detection_loss(cfg, bad_dist, bad_cls, anc, strides,
                            gt_labels, gt_boxes, gt_mask)
    good = v8_detection_loss(cfg, good_dist, good_cls, anc, strides,
                             gt_labels, gt_boxes, gt_mask)
    assert float(good["loss"]) < float(bad["loss"])
    assert float(good["box"]) < 0.05  # exact decode -> near-zero CIoU loss
    assert float(good["dfl"]) < float(bad["dfl"])


def test_v8_loss_grads_finite():
    cfg = V8LossConfig(nc=2)
    anc, strides = _grid(16, stride=8.0)
    B, S, R = 2, 16, 16
    rng = np.random.default_rng(1)
    dist = jnp.asarray(rng.standard_normal((B, S, 4, R)).astype(np.float32))
    cls = jnp.asarray(rng.standard_normal((B, S, 2)).astype(np.float32))
    gt_boxes = jnp.asarray(np.tile([[8.0, 8.0, 24.0, 24.0]], (B, 1, 1)))
    gt_labels = jnp.zeros((B, 1), jnp.int32)
    gt_mask = jnp.ones((B, 1), bool)

    def f(d, c):
        return v8_detection_loss(cfg, d, c, anc, strides, gt_labels,
                                 gt_boxes, gt_mask)["loss"]

    g1, g2 = jax.grad(f, argnums=(0, 1))(dist, cls)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
