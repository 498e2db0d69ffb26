"""Gradient / training-trajectory parity vs the torch reference
(round-4 VERDICT item #4).

Loss VALUES are pinned on identical inputs (test_torch_loss_parity);
this file pins the full TRAINING RECURRENCE: decoder train forward ->
intended track matching -> criterion -> backward -> SGD -> teacher-forced
state carry -> next frame, over a 3-frame clip for 5 steps, torch vs our
jitted `make_clip_loss_fn`. It would catch a stop-gradient or carry
mis-placement (`head.py:1087-1106` detaches, `qim.py:300` ref detach)
that every forward/loss parity test is blind to.

Torch side is the intended-semantics composition from reference modules
(same rationale as test_torch_stream_parity — the release's composed
path is unreachable): reference backbone + MYDecoder (train mode, CDN
off on both sides: the two frameworks' noise sources cannot be
synchronized) + the head's own HungarianMatcherGroup for the last-layer
matching (head.py:123, class cost gain 1) + the real MOTRTrackingLoss
(aux re-matching inside, class gain 2, loss.py:450) + torch.optim.SGD.
Teacher-forced carry per `train_update` semantics: every GT-matched
query becomes next frame's track query, ref points logit-space detached,
query_pos carried from the decoder's own query_pos tensor.

Cross-frame gradient flow: NONE by design in the release — carried refs
and the query_pos origins are detached inside `_get_decoder_input`
(train branches), and the QIM-refreshed embedding is never consumed by
the decoder (class-embedding track content, head.py:896-899). Both
loops implement exactly that, so matching grad norms here also proves
we did not accidentally leak gradient across frames.
"""

from __future__ import annotations

import pytest

# heavy tier (round-4 VERDICT weak #7): multi-minute reference-torch
# comparison; run with --runheavy / --runall
pytestmark = pytest.mark.heavy

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_torch_stream_parity import (  # noqa: E402,F401
    IMGSZ, _backbone_feats, _render_video, _to_torch, ref_model)
from tests.torch_ref import load_reference  # noqa: E402

T_FRAMES = 3
N_STEPS = 5
LR = 1e-3
GT_CLS = [0, 1, 2, 0]      # fixed classes for the 4 rendered blocks
TRAIN_IMGSZ = 96
# nq = ALL anchors (144 + 36 + 9 at 96^2): top-k selection becomes a
# permutation of the anchor set, and every downstream stage (attention,
# matching, losses, teacher-forced carry) is permutation-equivariant —
# so near-tie selection ORDER differences between frameworks (float
# noise, unavoidable in train mode where the eval-calibrated score gaps
# don't hold) cannot desynchronize the trajectories
TRAIN_NQ = (TRAIN_IMGSZ // 8) ** 2 + (TRAIN_IMGSZ // 16) ** 2 + \
    (TRAIN_IMGSZ // 32) ** 2


def _ref_train(tm, video, gt_boxes, nq, n_steps=N_STEPS, lr=LR):
    """Run the intended-semantics training loop on reference modules.
    Returns (per-step losses, step-0 global grad norm)."""
    load_reference()
    from ultralytics.utils import loss as ref_loss_mod
    from MOTR.util.misc import inverse_sigmoid

    head = tm.model[-1]
    dec = head.decoder
    old_nd, old_nq = dec.num_denoising, dec.num_queries
    dec.num_denoising = 0
    dec.num_queries = nq
    nc = head.nc
    crit = ref_loss_mod.MOTRTrackingLoss(nc=nc, use_vfl=True)
    crit_enc = ref_loss_mod.MOTRTrackingLoss(nc=nc, aux_loss=False,
                                             use_vfl=True)
    from ultralytics.utils.ops import HungarianMatcherGroup
    matcher = HungarianMatcherGroup()
    gt_cls_t = torch.tensor(GT_CLS, dtype=torch.long)
    gt_tid = torch.arange(len(GT_CLS))

    # capture the decoder-built query_pos (carried || posemb of proposals)
    capd = {}
    orig_gdi = dec._get_decoder_input

    def gdi(*a, **k):
        out = orig_gdi(*a, **k)
        capd["query_pos"] = out[5]
        return out

    dec._get_decoder_input = gdi
    opt = torch.optim.SGD(tm.parameters(), lr=lr, momentum=0.0)
    tm.train()
    losses, gnorm0 = [], None
    try:
        for step in range(n_steps):
            opt.zero_grad()
            total = 0.0
            nobj = 0
            carried = None  # dict: ids, ref(logit), qpos, logits
            for t in range(T_FRAMES):
                feats = _backbone_feats(tm, _to_torch(video[t:t + 1]))
                if carried is None:
                    x = dec(feats, is_first=True)
                    K = 0
                else:
                    K = carried["ids"].shape[0]
                    x = dec(feats, track_ref_pts=carried["ref"],
                            is_first=False, pre_class=carried["logits"],
                            track_query_pos=carried["qpos"])
                boxes, logits = x[0], x[1]        # [6,1,K+nq,4/nc]
                gtb = torch.from_numpy(gt_boxes[t])
                G = gtb.shape[0]
                # intended last-layer matching (head matcher, class gain 1):
                # tracked GTs bind to their slots; untracked GTs Hungarian-
                # match against DETECT queries only (head.py:392-468 intent)
                if K:
                    src_tr = torch.arange(K)
                    dst_tr = carried["ids"]            # slot i <- GT id i
                    untracked = torch.tensor(
                        [g for g in range(G)
                         if g not in set(dst_tr.tolist())], dtype=torch.long)
                else:
                    src_tr = dst_tr = torch.zeros(0, dtype=torch.long)
                    untracked = torch.arange(G)
                if len(untracked):
                    det_b = boxes[-1][:, K:]
                    det_l = logits[-1][:, K:]
                    ind = matcher(det_b, det_l, gtb[untracked],
                                  gt_cls_t[untracked], [len(untracked)])
                    src_det = K + ind[0][0]
                    dst_det = untracked[ind[0][1]]
                else:
                    src_det = dst_det = torch.zeros(0, dtype=torch.long)
                src = torch.cat([src_tr, src_det])
                dst = torch.cat([dst_tr, dst_det])
                batch = {"cls": gt_cls_t, "bboxes": gtb, "gt_groups": [G]}
                main, _ = crit((boxes, logits), batch,
                               match_indices=[(src, dst)],
                               unmatched_track_idxes=torch.arange(
                                   K, K + nq))
                # encoder aux layer: detect proposals, fresh Hungarian with
                # the criterion's aux semantics (frame_losses enc block)
                enc_b = x[2][:, K:] if x[2].shape[1] > nq else x[2]
                enc_l = x[3][:, K:] if x[3].shape[1] > nq else x[3]
                enc_ind = matcher(enc_b, enc_l, gtb, gt_cls_t, [G])
                enc, _ = crit_enc((enc_b[None], enc_l[None]), batch,
                                  match_indices=[tuple(
                                      torch.as_tensor(i) for i in enc_ind[0])])
                total = total + sum(main.values()) + sum(enc.values())
                nobj += G

                # teacher-forced carry in GT order (train_update semantics)
                with torch.no_grad():
                    order = torch.argsort(dst)     # slots in GT order
                    srcq = src[order]
                    carried = {
                        "ids": dst[order],
                        "ref": inverse_sigmoid(
                            boxes[-1][0, srcq].detach().clone()),
                        "qpos": capd["query_pos"][0, srcq].detach().clone(),
                        "logits": logits[-1][0, srcq].detach().clone(),
                    }
            loss = total / max(nobj, 1)
            loss.backward()
            if step == 0:
                gnorm0 = float(torch.sqrt(sum(
                    (p.grad ** 2).sum() for p in tm.parameters()
                    if p.grad is not None)))
            opt.step()
            losses.append(float(loss))
    finally:
        dec._get_decoder_input = orig_gdi
        dec.num_denoising, dec.num_queries = old_nd, old_nq
        tm.eval()
    return losses, gnorm0


def _our_train(sd, video, gt_boxes, nq, n_steps=N_STEPS, lr=LR):
    import optax

    from mo_yolo_tpu.models.tracker import TrackerConfig
    from mo_yolo_tpu.models.tracking_model import (
        build_tracking_model as build_ours, init_variables)
    from mo_yolo_tpu.train.losses import LossConfig
    from mo_yolo_tpu.train.train_step import TrainConfig, make_clip_loss_fn
    from mo_yolo_tpu.utils.checkpoint import apply_torch_state_dict

    G = gt_boxes.shape[1]
    cfg = TrackerConfig(n_slots=8)
    model = build_ours("mo_yolo_tpu/cfg/models/yolo_track.yaml",
                       impl="xla", dtype=jnp.float32, tracker=cfg, nq=nq,
                       num_denoising=0)
    variables = init_variables(model, jax.random.PRNGKey(0),
                               image_size=(TRAIN_IMGSZ, TRAIN_IMGSZ),
                               batch=1)
    variables, _ = apply_torch_state_dict(sd, variables, strict=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    lcfg = LossConfig(nc=model.spec.nc, use_vfl=True)
    tcfg = TrainConfig(clip_len=T_FRAMES, drop_prob=0.0, fp_ratio=0.0,
                       remat=False)
    loss_fn = make_clip_loss_fn(model, lcfg, tcfg)
    clip = {
        "images": jnp.asarray(video[:T_FRAMES])[:, None],        # [T,1,H,W,3]
        "gt_cls": jnp.asarray(np.tile(np.array(GT_CLS, np.int32),
                                      (T_FRAMES, 1))[:, None]),  # [T,1,G]
        "gt_boxes": jnp.asarray(gt_boxes[:T_FRAMES])[:, None],
        "gt_track_id": jnp.asarray(np.tile(np.arange(G, dtype=np.int32),
                                           (T_FRAMES, 1))[:, None]),
        "gt_mask": jnp.ones((T_FRAMES, 1, G), bool),
    }
    tx = optax.sgd(lr)
    opt_state = tx.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    losses, gnorm0 = [], None
    key = jax.random.PRNGKey(1)   # consumed only by disabled noise paths
    for step in range(n_steps):
        (loss, (batch_stats, _)), grads = vg(params, batch_stats, clip, key)
        if step == 0:
            gnorm0 = float(optax.global_norm(grads))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return losses, gnorm0


def test_training_trajectory_parity(ref_model):
    tm, _ = ref_model        # fixture's eval-calibrated nq unused here
    nq = TRAIN_NQ
    video, gt = _render_video(T_FRAMES, size=TRAIN_IMGSZ, return_boxes=True)
    # .copy() is load-bearing: .float().numpy() on f32 params SHARES the
    # torch buffer, and _ref_train's SGD mutates params in place
    sd = {k: v.float().numpy().copy() for k, v in tm.state_dict().items()}

    ref_losses, ref_g0 = _ref_train(tm, video, gt, nq)
    # _ref_train mutated tm's weights via SGD — restore for other tests
    with torch.no_grad():
        for k, p in tm.state_dict().items():
            p.copy_(torch.from_numpy(sd[k]))
    our_losses, our_g0 = _our_train(sd, video, gt, nq)

    assert ref_g0 is not None and our_g0 is not None
    # per-step loss agreement (<=1e-3 rel, VERDICT round-4 item #4)
    for step, (r, o) in enumerate(zip(ref_losses, our_losses)):
        assert abs(r - o) <= 1e-3 * max(abs(r), 1.0), (step, r, o)
    # step-0 gradient norm agreement
    assert abs(ref_g0 - our_g0) <= 5e-3 * max(ref_g0, 1.0), (ref_g0, our_g0)
    # the trajectory must actually move (SGD is doing something)
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-6
