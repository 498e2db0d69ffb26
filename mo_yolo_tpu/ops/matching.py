"""Bipartite matching for set-prediction losses.

Reference: `HungarianMatcher`/`HungarianMatcherGroup`
(`ultralytics/utils/ops.py:746-984`) — focal-class + L1 + GIoU cost with
gains {class: 2, bbox: 5, giou: 2}, NaN scrub, per-image scipy
`linear_sum_assignment` on CPU.

TPU-native design: ground truth is padded to a static `max_gt` with a
column mask, so the cost matrix has a fixed shape and matching can run

  * `impl='scipy'` — host callback to `scipy.optimize.linear_sum_assignment`
    (bit-exact with the reference; one host sync per call), or
  * `impl='auction'` — a Jacobi auction algorithm that runs entirely
    on-device inside jit/pjit (no host round-trip; optimal within eps, which
    is far below the cost scale that changes DETR matching in practice).

Both return, for each GT column, the assigned query row (-1 for padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mo_yolo_tpu.ops.boxes import pairwise_giou, xywh2xyxy


# --------------------------------------------------------------------- #
# cost construction
# --------------------------------------------------------------------- #
def match_cost(pred_boxes: jnp.ndarray, pred_logits: jnp.ndarray,
               gt_boxes: jnp.ndarray, gt_cls: jnp.ndarray,
               gt_mask: jnp.ndarray,
               gain_class: float = 2.0, gain_bbox: float = 5.0,
               gain_giou: float = 2.0, alpha: float = 0.25,
               gamma: float = 2.0, big: float = 1e6) -> jnp.ndarray:
    """DETR matching cost (reference `ops.py:816-847`).

    pred_boxes [Q,4] cxcywh, pred_logits [Q,nc], gt_boxes [G,4], gt_cls [G]
    int, gt_mask [G] bool (False = padding). Returns cost [Q, G] with padded
    columns set to `big` (never matched before real columns).
    """
    p = jax.nn.sigmoid(pred_logits)  # [Q, nc]
    neg = (1 - alpha) * (p ** gamma) * (-jnp.log(1 - p + 1e-8))
    pos = alpha * ((1 - p) ** gamma) * (-jnp.log(p + 1e-8))
    cls_cost = (pos - neg)[:, gt_cls]  # [Q, G]

    bbox_cost = jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]).sum(-1)
    giou_cost = 1.0 - pairwise_giou(xywh2xyxy(pred_boxes), xywh2xyxy(gt_boxes))

    c = gain_class * cls_cost + gain_bbox * bbox_cost + gain_giou * giou_cost
    c = jnp.where(jnp.isnan(c) | jnp.isinf(c), 0.0, c)  # reference NaN scrub
    return jnp.where(gt_mask[None, :], c, big)


# --------------------------------------------------------------------- #
# scipy host-callback path
# --------------------------------------------------------------------- #
def _scipy_assign(cost: np.ndarray, mask: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment
    B, Q, G = cost.shape
    out = np.full((B, G), -1, np.int32)
    for b in range(B):
        n = int(mask[b].sum())
        if n == 0:
            continue
        cols = np.nonzero(mask[b])[0]
        r, c = linear_sum_assignment(cost[b][:, cols])
        out[b, cols[c]] = r.astype(np.int32)
    return out


def hungarian_scipy(cost: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """cost [B,Q,G], gt_mask [B,G] -> assignment [B,G] int32 (query per GT)."""
    B, Q, G = cost.shape
    return jax.pure_callback(
        _scipy_assign,
        jax.ShapeDtypeStruct((B, G), jnp.int32),
        cost.astype(jnp.float32), gt_mask,
        vmap_method="sequential")


# --------------------------------------------------------------------- #
# on-device auction algorithm
# --------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("max_iters",))
def _auction_single(cost: jnp.ndarray, col_valid: jnp.ndarray,
                    eps: jnp.ndarray, max_iters: int = 2000):
    """Jacobi auction: persons = GT columns bid for objects = query rows.

    Minimizes sum(cost[assign[g], g]) over distinct rows. eps-optimal:
    within G*eps of the true optimum.
    """
    Q, G = cost.shape
    benefit = -cost.T  # [G, Q] maximize
    big_neg = jnp.asarray(-1e9, benefit.dtype)

    def cond(s):
        price, owner, assign, it = s
        return (it < max_iters) & jnp.any(col_valid & (assign < 0))

    def body(s):
        price, owner, assign, it = s
        bidding = col_valid & (assign < 0)  # [G]
        value = benefit - price[None, :]    # [G, Q]
        v_sorted = jax.lax.top_k(value, 2)[0]  # [G, 2]
        best_obj = jnp.argmax(value, axis=1)   # [G]
        bid_inc = v_sorted[:, 0] - v_sorted[:, 1] + eps
        bid_amount = price[best_obj] + bid_inc  # [G]
        bid_amount = jnp.where(bidding, bid_amount, big_neg)
        # per-object: highest bid wins (segment max over bidders)
        obj_best_bid = jnp.full((Q,), big_neg, benefit.dtype).at[best_obj].max(
            jnp.where(bidding, bid_amount, big_neg))
        won = bidding & (bid_amount >= obj_best_bid[best_obj]) & \
              (obj_best_bid[best_obj] > big_neg)
        # tie-break: lowest person index wins
        winner = jnp.full((Q,), G, jnp.int32).at[
            jnp.where(won, best_obj, Q)].min(
            jnp.arange(G, dtype=jnp.int32), mode="drop")
        actually_won = won & (winner[best_obj] == jnp.arange(G))
        # winners take ownership; previous owners are implicitly evicted
        # because `assign` is rebuilt from the (authoritative) owner map
        owner2 = owner.at[jnp.where(actually_won, best_obj, Q)].set(
            jnp.arange(G, dtype=jnp.int32), mode="drop")
        price2 = price.at[jnp.where(actually_won, best_obj, Q)].set(
            jnp.where(actually_won, bid_amount, 0.0), mode="drop")
        # recompute assign from owner (owner is authoritative)
        assign2 = jnp.full((G,), -1, jnp.int32).at[
            jnp.where(owner2 >= 0, owner2, G)].set(
            jnp.arange(Q, dtype=jnp.int32), mode="drop")
        return price2, owner2, assign2, it + 1

    price0 = jnp.zeros((Q,), benefit.dtype)
    owner0 = jnp.full((Q,), -1, jnp.int32)
    assign0 = jnp.full((G,), -1, jnp.int32)
    price, owner, assign, _ = jax.lax.while_loop(
        cond, body, (price0, owner0, assign0, jnp.int32(0)))
    return jnp.where(col_valid, assign, -1)


def hungarian_auction(cost: jnp.ndarray, gt_mask: jnp.ndarray,
                      eps_scale: float = 1e-3) -> jnp.ndarray:
    """On-device eps-optimal assignment. cost [B,Q,G]; gt_mask [B,G]."""
    spread = jnp.maximum(jnp.max(jnp.abs(cost), axis=(1, 2)), 1.0)  # [B]
    eps = (eps_scale * spread / cost.shape[2]).astype(cost.dtype)
    return jax.vmap(lambda c, m, e: _auction_single(c, m, e))(
        cost, gt_mask, eps)


def hungarian(cost: jnp.ndarray, gt_mask: jnp.ndarray,
              impl: str = "auction") -> jnp.ndarray:
    """Default = on-device auction: host callbacks are unsupported on some
    TPU runtimes (and the scipy path host-syncs every call); the scipy
    implementation remains available as the parity oracle."""
    if impl == "scipy":
        return hungarian_scipy(cost, gt_mask)
    return hungarian_auction(cost, gt_mask)
