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
    tl, tb, ts, fg, _ = task_aligned_assign(cfg, pd_scores, pd_boxes, anc_px,
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
    _, _, _, fg, _ = task_aligned_assign(cfg, pd_scores, pd_boxes, anc * 8.0,
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


def _raw_head_inputs(B=1, nc=2, G=3, reg_max=8, seed=0):
    rng = np.random.default_rng(seed)
    # one tiny 8x8 level at stride 8 (64px image)
    S = 64
    anc = np.stack(np.meshgrid(np.arange(8) + 0.5, np.arange(8) + 0.5,
                               indexing="xy"), -1).reshape(-1, 2)
    strides = np.full((S,), 8.0, np.float32)
    box_dist = rng.standard_normal((B, S, 4, reg_max)).astype(np.float32)
    cls_logits = rng.standard_normal((B, S, nc)).astype(np.float32)
    gt_boxes = np.array([[[8, 8, 24, 24], [30, 30, 50, 52],
                          [10, 40, 26, 60]]], np.float32)
    gt_labels = np.array([[0, 1, 0]], np.int32)
    gt_mask = np.ones((B, G), bool)
    return (jnp.asarray(box_dist), jnp.asarray(cls_logits),
            jnp.asarray(anc.astype(np.float32)), jnp.asarray(strides),
            jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
            jnp.asarray(gt_mask))


def test_segmentation_loss_prefers_correct_masks():
    from mo_yolo_tpu.train.v8_loss import v8_segmentation_loss

    box_dist, cls_logits, anc, strides, gl, gb, gm = _raw_head_inputs()
    rng = np.random.default_rng(1)
    B, S = cls_logits.shape[:2]
    nm, Hp, Wp = 8, 16, 16
    protos = jnp.asarray(rng.standard_normal((B, Hp, Wp, nm)), jnp.float32)
    coef = jnp.asarray(rng.standard_normal((B, S, nm)), jnp.float32)
    # GT masks: filled boxes at proto resolution (imgsz 64 -> 16 grid)
    gt_masks = np.zeros((B, 3, Hp, Wp), np.float32)
    for g in range(3):
        x1, y1, x2, y2 = (np.asarray(gb)[0, g] / 64 * Hp).astype(int)
        gt_masks[0, g, y1:y2, x1:x2] = 1.0
    cfg = V8LossConfig(nc=2, reg_max=8)
    out = v8_segmentation_loss(cfg, box_dist, cls_logits, anc, strides,
                               coef, protos, gl, gb, gm,
                               jnp.asarray(gt_masks), imgsz=64.0)
    assert np.isfinite(float(out["loss"])) and float(out["mask"]) > 0
    # grads flow into coef and protos
    g = jax.grad(lambda c, p: v8_segmentation_loss(
        cfg, box_dist, cls_logits, anc, strides, c, p, gl, gb, gm,
        jnp.asarray(gt_masks), imgsz=64.0)["loss"], argnums=(0, 1))(
        coef, protos)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert any(float(np.abs(np.asarray(x)).max()) > 0 for x in g)


def test_pose_loss_zero_for_perfect_keypoints():
    from mo_yolo_tpu.train.v8_loss import v8_pose_loss

    box_dist, cls_logits, anc, strides, gl, gb, gm = _raw_head_inputs()
    B, S = cls_logits.shape[:2]
    K = 4
    rng = np.random.default_rng(2)
    gt_kpts = np.zeros((B, 3, K, 3), np.float32)
    for g in range(3):
        x1, y1, x2, y2 = np.asarray(gb)[0, g]
        gt_kpts[0, g, :, 0] = np.linspace(x1, x2, K)
        gt_kpts[0, g, :, 1] = np.linspace(y1, y2, K)
        gt_kpts[0, g, :, 2] = 2.0
    cfg = V8LossConfig(nc=2, reg_max=8)
    # pred == gt at every anchor (broadcast the right GT is impossible per
    # anchor; instead set preds so that anchor's ASSIGNED gt kpts match)
    # simpler property: perfect kpts with huge vis logits -> pose ~ 0
    from mo_yolo_tpu.train.v8_loss import _assignment
    tb, ts, fg, assigned = _assignment(cfg, box_dist, cls_logits, anc,
                                       strides, gl, gb, gm)
    tk = jnp.take_along_axis(jnp.asarray(gt_kpts),
                             assigned[:, :, None, None], axis=1)
    perfect = jnp.concatenate([tk[..., :2],
                               jnp.full((B, S, K, 1), 20.0)], -1)
    out = v8_pose_loss(cfg, box_dist, cls_logits, anc, strides, perfect,
                       gl, gb, gm, jnp.asarray(gt_kpts))
    assert float(out["pose"]) < 1e-5
    assert float(out["kobj"]) < 1e-4
    # shifted keypoints -> positive pose loss
    out2 = v8_pose_loss(cfg, box_dist, cls_logits, anc, strides,
                        perfect.at[..., :2].add(10.0), gl, gb, gm,
                        jnp.asarray(gt_kpts))
    assert float(out2["pose"]) > float(out["pose"])


def test_classification_loss():
    from mo_yolo_tpu.train.v8_loss import classification_loss

    logits = jnp.asarray([[5.0, -5.0], [-5.0, 5.0]])
    labels = jnp.asarray([0, 1])
    assert float(classification_loss(logits, labels)) < 1e-3
    assert float(classification_loss(logits, jnp.asarray([1, 0]))) > 5.0


def test_classification_loss_label_smoothing():
    """Matches torch CrossEntropyLoss(label_smoothing=s): targets become
    (1-s)*onehot + s/nc, i.e. loss = (1-s)*nll + s*mean_c(-log p_c)."""
    import numpy as np
    from mo_yolo_tpu.train.v8_loss import classification_loss

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=4))
    s = 0.1
    got = float(classification_loss(logits, labels, label_smoothing=s))

    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    onehot = np.eye(5)[np.asarray(labels)]
    tgt = (1 - s) * onehot + s / 5
    want = float(np.mean(-(tgt * logp).sum(-1)))
    assert abs(got - want) < 1e-6, (got, want)
    # s=0 reduces to plain NLL
    plain = float(classification_loss(logits, labels))
    nll = float(np.mean(-logp[np.arange(4), np.asarray(labels)]))
    assert abs(plain - nll) < 1e-6


def test_segment_pose_heads_raw_mode_and_training_step():
    """Raw-mode heads feed their losses end-to-end: one SGD step on each
    task decreases (or keeps finite) its loss — the seg/pose training path
    exists (round-1 missing #6)."""
    from mo_yolo_tpu.models.heads_extra import PoseHead, SegmentHead
    from mo_yolo_tpu.train.v8_loss import (v8_pose_loss,
                                           v8_segmentation_loss)

    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((1, 8, 8, 32)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 4, 4, 64)), jnp.float32),
             jnp.asarray(rng.standard_normal((1, 2, 2, 64)), jnp.float32)]
    gb = jnp.asarray([[[8, 8, 24, 24]]], jnp.float32)
    gl = jnp.zeros((1, 1), jnp.int32)
    gm = jnp.ones((1, 1), bool)
    cfg = V8LossConfig(nc=2, reg_max=16)

    seg = SegmentHead(nc=2, nm=8)
    vs = seg.init(jax.random.PRNGKey(0), feats, False, True)
    gt_masks = jnp.zeros((1, 1, 16, 16)).at[0, 0, 2:6, 2:6].set(1.0)

    def seg_loss(v):
        bd, cl, anc, st, coef, protos = seg.apply(v, feats, False, True)
        return v8_segmentation_loss(cfg, bd, cl, anc, st, coef, protos,
                                    gl, gb, gm, gt_masks, imgsz=64.0)["loss"]

    l0, g = jax.value_and_grad(seg_loss)(vs)
    v1 = jax.tree.map(lambda p, gg: p - 1e-3 * gg, vs, g)
    l1 = seg_loss(v1)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)

    pose = PoseHead(nc=2, kpt_shape=(3, 3))
    vp = pose.init(jax.random.PRNGKey(0), feats, False, True)
    gt_kpts = jnp.asarray([[[[10, 10, 2], [16, 16, 2], [20, 20, 0]]]],
                          jnp.float32)

    def pose_loss(v):
        bd, cl, anc, st, kpts = pose.apply(v, feats, False, True)
        return v8_pose_loss(cfg, bd, cl, anc, st, kpts, gl, gb, gm,
                            gt_kpts)["loss"]

    l0, g = jax.value_and_grad(pose_loss)(vp)
    v1 = jax.tree.map(lambda p, gg: p - 1e-3 * gg, vp, g)
    assert np.isfinite(float(l0)) and float(pose_loss(v1)) < float(l0)


def test_pose_loss_per_keypoint_sigmas():
    """Round-2 advisor: KeypointLoss must weight joints by OKS sigma
    (reference `utils/loss.py:125,332`) — the same pixel error on a
    low-sigma joint (eye, sigma .026) must cost more than on a
    high-sigma joint (hip, sigma .107)."""
    from mo_yolo_tpu.train.v8_loss import _assignment, v8_pose_loss

    box_dist, cls_logits, anc, strides, gl, gb, gm = _raw_head_inputs()
    B, S = cls_logits.shape[:2]
    K = 17
    gt_kpts = np.zeros((B, 3, K, 3), np.float32)
    for g in range(3):
        x1, y1, x2, y2 = np.asarray(gb)[0, g]
        gt_kpts[0, g, :, 0] = np.linspace(x1, x2, K)
        gt_kpts[0, g, :, 1] = np.linspace(y1, y2, K)
        gt_kpts[0, g, :, 2] = 2.0
    cfg = V8LossConfig(nc=2, reg_max=8)
    tb, ts, fg, assigned = _assignment(cfg, box_dist, cls_logits, anc,
                                       strides, gl, gb, gm)
    tk = jnp.take_along_axis(jnp.asarray(gt_kpts),
                             assigned[:, :, None, None], axis=1)
    perfect = jnp.concatenate([tk[..., :2],
                               jnp.full((B, S, K, 1), 20.0)], -1)

    def loss_with_shift(j):
        shifted = perfect.at[..., j, :2].add(5.0)
        out = v8_pose_loss(cfg, box_dist, cls_logits, anc, strides,
                           shifted, gl, gb, gm, jnp.asarray(gt_kpts))
        return float(out["pose"])

    assert loss_with_shift(0) > loss_with_shift(11) * 1.05
