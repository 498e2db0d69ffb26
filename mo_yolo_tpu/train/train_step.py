"""Clip-level training step: per-frame scan, loss, grads, optimizer.

Reference training loop semantics (`models/MOTRtrack/train.py:211-257`):
clips of `clip_len` consecutive frames per video, per-frame forward with the
track state carried across frames (frame 0 starts from an empty state = the
reference's `is_first`), clip loss normalized by the clip's total GT count,
grad clipping at norm 10, EMA of parameters, AMP -> bf16 on TPU (no grad
scaler needed), per-frame activation recompute via `jax.checkpoint`
(reference: `MOTR/models/motr.py:614-640` CheckpointFunction).

TPU-first: the whole clip is ONE jitted function — `lax.scan` over frames,
vectorized over the stream batch, sharded over the data axis of a device
mesh (see mo_yolo_tpu.parallel). No host syncs inside.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from mo_yolo_tpu.models.tracker import init_track_state
from mo_yolo_tpu.train.losses import (
    LossConfig, dn_losses, layer_loss, matched_layer_losses,
)
from mo_yolo_tpu.ops.matching import hungarian_jv, match_cost


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    clip_len: int = 5
    lr: float = 1e-4
    lrf: float = 0.01               # final LR fraction (reference `lrf`)
    weight_decay: float = 1e-4
    grad_clip: float = 10.0          # reference `train.py:427` clip-norm 10
    ema_decay: float = 0.9999        # reference ModelEMA (`torch_utils.py:342`)
    warmup_steps: int = 500
    total_steps: int = 100_000
    remat: bool = True
    drop_prob: float = 0.1           # QIM random_drop_tracks (`qim.py:17`)
    fp_ratio: float = 0.3            # QIM FP injection
    accumulate: int = 1              # grad-accumulation mini-steps per update
                                     # (reference nbs/batch, `train.py:238-257`)
    optimizer: str = "adamw"         # sgd|adam|adamw|nadam|radam|rmsprop|auto
    momentum: float = 0.937          # SGD momentum / adam beta1 (reference
                                     # `default.yaml` momentum)
    cos_lr: bool = True              # cosine decay (False -> reference's
                                     # linear `lf` lambda, `trainer.py:223`)
    warmup_momentum: float = 0.8     # SGD momentum ramp start over warmup
    warmup_bias_lr: float = 0.0      # bias-group LR ramp START (reference
                                     # warms biases DOWN from 0.1 by default;
                                     # 0.0 here = same ramp as other groups)


def _param_group_labels(params):
    """Reference parameter groups (`ultralytics/engine/trainer.py`
    build_optimizer): g2 = biases (no weight decay, own warmup start LR),
    g1 = norm scales (no decay), g0 = all other weights (decayed).
    Flax naming: BatchNorm/LayerNorm gains are 'scale', biases 'bias'."""

    def lab(path, _):
        name = getattr(path[-1], "key", None) if path else None
        if name == "bias":
            return "bias"
        if name == "scale":
            return "norm"
        return "weight"

    return jax.tree_util.tree_map_with_path(lab, params)


def make_optimizer(cfg: TrainConfig, nc: int = 80) -> optax.GradientTransformation:
    """Reference-parity optimizer factory.

    Mirrors `ultralytics/engine/trainer.py` build_optimizer + the warmup
    logic of `optimizer_step`/`_setup_train`: three param groups, per-group
    weight decay, linear LR warmup (biases from `warmup_bias_lr`), then
    cosine (`cos_lr`) or linear decay to `lr*lrf`; SGD-family momentum ramps
    `warmup_momentum -> momentum` over the warmup. `optimizer='auto'`
    follows the reference heuristic: long runs get SGD at lr0, short runs
    AdamW at a fitted LR with no bias warmup.
    """
    # short runs: warmup must leave room for a positive-length decay
    warmup = min(cfg.warmup_steps, max(cfg.total_steps // 2, 1))
    total = max(cfg.total_steps, warmup + 1)
    name = (cfg.optimizer or "adamw").lower()
    lr, momentum, wbl = cfg.lr, cfg.momentum, cfg.warmup_bias_lr
    wd = cfg.weight_decay
    if name == "auto":
        if total > 10_000:
            name = "sgd"
        else:
            name, lr, momentum, wbl = (
                "adamw", round(0.002 * 5 / (4 + nc), 6), 0.9, 0.0)

    def lr_sched(start: float):
        ramp = optax.linear_schedule(start, lr, warmup)
        if cfg.cos_lr:
            dec = optax.cosine_decay_schedule(lr, max(total - warmup, 1),
                                              alpha=cfg.lrf)
        else:
            dec = optax.linear_schedule(lr, lr * cfg.lrf,
                                        max(total - warmup, 1))
        return optax.join_schedules([ramp, dec], [warmup])

    mom_sched = optax.join_schedules(
        [optax.linear_schedule(cfg.warmup_momentum, momentum, warmup),
         optax.constant_schedule(momentum)], [warmup])

    def group(decay: bool, start_lr: float) -> optax.GradientTransformation:
        parts = []
        wd_g = wd if decay else 0.0
        if name == "sgd":
            # torch SGD: L2 decay folded into the gradient BEFORE momentum
            if wd_g:
                parts.append(optax.add_decayed_weights(wd_g))
            parts.append(optax.inject_hyperparams(optax.trace)(
                decay=mom_sched, nesterov=True))
        elif name == "rmsprop":
            if wd_g:
                parts.append(optax.add_decayed_weights(wd_g))
            parts.append(optax.scale_by_rms())
            parts.append(optax.inject_hyperparams(optax.trace)(
                decay=mom_sched))
        elif name in ("adam", "nadam", "radam"):
            # torch Adam-family couples decay into the grad pre-moments
            if wd_g:
                parts.append(optax.add_decayed_weights(wd_g))
            if name == "radam" and hasattr(optax, "scale_by_radam"):
                parts.append(optax.scale_by_radam(b1=momentum))
            else:
                parts.append(optax.scale_by_adam(
                    b1=momentum, nesterov=(name == "nadam")))
        elif name == "adamw":
            parts.append(optax.scale_by_adam(b1=momentum))
            if wd_g:   # decoupled decay AFTER the moments (AdamW)
                parts.append(optax.add_decayed_weights(wd_g))
        else:
            raise ValueError(
                f"unknown optimizer {cfg.optimizer!r}; choose from "
                "sgd|adam|adamw|nadam|radam|rmsprop|auto")
        parts.append(optax.scale_by_learning_rate(lr_sched(start_lr)))
        return optax.chain(*parts)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {"weight": group(True, 0.0), "norm": group(False, 0.0),
             "bias": group(False, wbl)},
            _param_group_labels),
    )
    if cfg.accumulate > 1:
        # average grads over k mini-steps, update params every k-th
        # (reference's `accumulate` loss-scaling + deferred optimizer.step)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate)
    return tx


def frame_losses(lcfg: LossConfig, outs: Dict, gt_cls, gt_boxes, gt_mask,
                 n_track: int) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """All loss terms for one frame (un-normalized sums).

    Composition mirrors `MOTRTrackingLoss.forward` (`loss.py:701-723`) +
    `TrackingModel.loss` (`tasks.py:311-459`): last-layer loss on the given
    track-aware matching; per-layer aux losses restricted to detect queries
    (`loss.py:682-696`); an encoder-output loss (the reference prepends enc
    outputs as an extra aux layer, `tasks.py:378-379`); a denoising branch.
    """
    B, Qm = outs["main_logits"].shape[1:3]
    det_mask = jnp.zeros((B, Qm), bool).at[:, n_track:].set(True)

    main = matched_layer_losses(lcfg, outs["main_boxes"], outs["main_logits"],
                                gt_boxes, gt_cls, gt_mask, outs["assign"],
                                aux_query_mask=det_mask,
                                main_query_mask=outs.get("query_valid"))
    # encoder layer (detect queries only, fresh Hungarian)
    enc_cost = jax.vmap(match_cost)(outs["enc_boxes"], outs["enc_logits"],
                                    gt_boxes, gt_cls, gt_mask)
    enc_assign = hungarian_jv(enc_cost, gt_mask)
    enc = layer_loss(lcfg, outs["enc_boxes"], outs["enc_logits"], gt_boxes,
                     gt_cls, gt_mask, enc_assign)
    dn = dn_losses(lcfg, outs["dn_boxes"], outs["dn_logits"], gt_boxes,
                   gt_cls, gt_mask, outs["num_dn_group"])

    terms = dict(main)
    terms["loss_class_enc"] = enc["loss_class"]
    terms["loss_bbox_enc"] = enc["loss_bbox"]
    terms["loss_giou_enc"] = enc["loss_giou"]
    terms.update(dn)
    total = sum(v for k, v in terms.items() if k.startswith("loss"))
    return total, terms


def make_clip_loss_fn(model, lcfg: LossConfig, tcfg: TrainConfig):
    """Returns loss_fn(params, batch_stats, clip, key) -> (loss, aux).

    clip: dict of per-frame arrays with leading time axis T:
      images [T,B,H,W,3], gt_cls/gt_track_id [T,B,G], gt_boxes [T,B,G,4],
      gt_mask [T,B,G].
    """
    n_track = model.tracker.n_slots

    def frame_step(params, batch_stats, state, xs, key):
        (new_state, outs), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xs["images"], state, xs["gt_cls"], xs["gt_boxes"],
            xs["gt_track_id"], xs["gt_mask"], key,
            tcfg.drop_prob, tcfg.fp_ratio,
            method=model.train_frame, mutable=["batch_stats"])
        total, terms = frame_losses(lcfg, outs, xs["gt_cls"], xs["gt_boxes"],
                                    xs["gt_mask"], n_track)
        nobj = jnp.sum(xs["gt_mask"])
        return new_state, mut["batch_stats"], total, terms, nobj

    if tcfg.remat:
        frame_step = jax.checkpoint(
            frame_step, policy=jax.checkpoint_policies.nothing_saveable,
            static_argnums=())

    def loss_fn(params, batch_stats, clip, key):
        B = clip["images"].shape[1]
        state0 = init_track_state(B, n_track, model.hd)
        T = clip["images"].shape[0]
        keys = jax.random.split(key, T)

        def body(carry, xs_key):
            state, bstats, tot, nobj = carry
            xs, k = xs_key
            state, bstats, t, terms, n = frame_step(params, bstats, state, xs, k)
            return (state, bstats, tot + t, nobj + n), terms

        (state, bstats, total, nobj), term_seq = jax.lax.scan(
            body, (state0, batch_stats, 0.0, 0.0),
            (clip, keys))
        # clip loss normalized by total object count (`train.py:251`)
        loss = total / jnp.maximum(nobj, 1.0)
        metrics = {k: v.sum() / jnp.maximum(nobj, 1.0)
                   for k, v in term_seq.items()}
        metrics["num_objects"] = nobj
        return loss, (bstats, metrics)

    return loss_fn


def make_train_step(model, lcfg: LossConfig, tcfg: TrainConfig,
                    tx: Optional[optax.GradientTransformation] = None):
    """Returns (init_fn(variables) -> TrainState, step_fn(ts, clip, key))."""
    tx = tx or make_optimizer(tcfg, nc=lcfg.nc)
    loss_fn = make_clip_loss_fn(model, lcfg, tcfg)

    def init_fn(variables) -> TrainState:
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            # distinct buffers: the train step donates its input TrainState,
            # and XLA rejects donating aliased params/ema arrays twice
            ema_params=jax.tree.map(lambda x: x.copy(), params),
            step=jnp.zeros((), jnp.int32),
        )

    def step_fn(ts: TrainState, clip, key):
        (loss, (bstats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.batch_stats, clip, key)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        # ramped decay (reference ModelEMA, `torch_utils.py:342`:
        # decay * (1 - exp(-updates/tau)), tau=2000): without the ramp a
        # flat 0.9999 leaves the EMA ~66% random init after 4k steps
        d = jnp.asarray(tcfg.ema_decay) * \
            (1.0 - jnp.exp(-(ts.step.astype(jnp.float32) + 1.0) / 2000.0))
        if tcfg.accumulate > 1:
            # EMA tracks emitted optimizer steps only: during accumulation
            # mini-steps params are unchanged and the EMA must not decay
            emitted = opt_state.mini_step == 0
            d = jnp.where(emitted, d, 1.0)
        ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                           ts.ema_params, params)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, bstats, opt_state, ema, ts.step + 1), metrics

    return init_fn, step_fn
