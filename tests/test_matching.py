"""Matching parity: on-device auction vs scipy optimal (SURVEY.md §7 step 7:
'optional jittable variant with a parity test against scipy')."""

import numpy as np
import jax.numpy as jnp

from mo_yolo_tpu.ops.matching import (
    hungarian_auction, hungarian_scipy, match_cost,
)


def test_scipy_assignment_valid():
    rng = np.random.default_rng(0)
    B, Q, G = 3, 20, 7
    cost = rng.standard_normal((B, Q, G)).astype(np.float32)
    mask = np.ones((B, G), bool)
    mask[1, 5:] = False
    a = np.asarray(hungarian_scipy(jnp.asarray(cost), jnp.asarray(mask)))
    assert a.shape == (B, G)
    for b in range(B):
        rows = a[b][mask[b]]
        assert (rows >= 0).all() and len(set(rows.tolist())) == len(rows)
    assert (a[1, 5:] == -1).all()


def test_auction_matches_scipy_total_cost():
    rng = np.random.default_rng(1)
    B, Q, G = 4, 50, 12
    cost = rng.standard_normal((B, Q, G)).astype(np.float32) * 3
    mask = np.ones((B, G), bool)
    mask[2, 8:] = False
    s = np.asarray(hungarian_scipy(jnp.asarray(cost), jnp.asarray(mask)))
    a = np.asarray(hungarian_auction(jnp.asarray(cost), jnp.asarray(mask)))
    for b in range(B):
        cols = np.nonzero(mask[b])[0]
        rows_a = a[b, cols]
        assert (rows_a >= 0).all(), f"auction left unassigned in batch {b}"
        assert len(set(rows_a.tolist())) == len(rows_a), "duplicate rows"
        c_s = cost[b][s[b, cols], cols].sum()
        c_a = cost[b][rows_a, cols].sum()
        assert c_a <= c_s + 0.05 * (abs(c_s) + 1), (c_a, c_s)


def test_match_cost_prefers_correct_box_and_class():
    Q, G, nc = 4, 2, 3
    pred_boxes = jnp.asarray([[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2],
                              [0.5, 0.5, 0.3, 0.3], [0.1, 0.8, 0.1, 0.1]])
    logits = jnp.full((Q, nc), -4.0)
    logits = logits.at[0, 1].set(4.0).at[1, 2].set(4.0)
    gt_boxes = jnp.asarray([[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2]])
    gt_cls = jnp.asarray([1, 2])
    mask = jnp.ones(G, bool)
    c = match_cost(pred_boxes, logits, gt_boxes, gt_cls, mask)
    assert c.shape == (Q, G)
    assert c[0, 0] < c[1, 0] and c[0, 0] < c[2, 0]
    assert c[1, 1] < c[0, 1] and c[1, 1] < c[3, 1]
    a = np.asarray(hungarian_scipy(c[None], mask[None]))[0]
    np.testing.assert_array_equal(a, [0, 1])


def test_match_cost_padding_masked():
    rng = np.random.default_rng(2)
    c = match_cost(jnp.asarray(rng.uniform(0.1, 0.9, (5, 4)), dtype=jnp.float32),
                   jnp.asarray(rng.standard_normal((5, 3)), dtype=jnp.float32),
                   jnp.asarray(rng.uniform(0.1, 0.9, (4, 4)), dtype=jnp.float32),
                   jnp.zeros(4, jnp.int32),
                   jnp.asarray([True, True, False, False]))
    assert np.all(np.asarray(c[:, 2:]) >= 1e5)
    assert np.all(np.asarray(c[:, :2]) < 1e5)
