"""Kernel-level parity tests for core ops.

Oracles are independent torch (CPU) implementations of the public math —
grid_sample for deformable attention, torchvision-free IoU formulas — the
same validation methodology as the reference's `MOTR/models/ops/test.py`
(reference-impl oracle + gradient checks).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops import (
    xywh2xyxy, xyxy2xywh, elementwise_iou, pairwise_iou, pairwise_giou,
    inverse_sigmoid, pos2posemb, generate_anchors, ms_deform_attn_xla,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_box_roundtrip():
    rng = np.random.default_rng(0)
    b = rng.uniform(0.2, 0.8, size=(7, 4)).astype(np.float32)
    out = np.asarray(xyxy2xywh(xywh2xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)


def test_pairwise_iou_matches_manual():
    rng = np.random.default_rng(1)
    a = np.sort(rng.uniform(0, 1, size=(5, 2, 2)), axis=1).reshape(5, 4).astype(np.float32)
    b = np.sort(rng.uniform(0, 1, size=(6, 2, 2)), axis=1).reshape(6, 4).astype(np.float32)
    a_xyxy = a[:, [0, 2, 1, 3]]
    b_xyxy = b[:, [0, 2, 1, 3]]
    got = np.asarray(pairwise_iou(jnp.asarray(a_xyxy), jnp.asarray(b_xyxy)))
    # torch oracle
    ta, tb = torch.tensor(a_xyxy), torch.tensor(b_xyxy)
    lt = torch.max(ta[:, None, :2], tb[None, :, :2])
    rb = torch.min(ta[:, None, 2:], tb[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (ta[:, 2] - ta[:, 0]) * (ta[:, 3] - ta[:, 1])
    area_b = (tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1])
    want = (inter / (area_a[:, None] + area_b[None, :] - inter)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_elementwise_giou_bounds():
    rng = np.random.default_rng(2)
    a = rng.uniform(0.3, 0.7, size=(64, 4)).astype(np.float32)
    b = rng.uniform(0.3, 0.7, size=(64, 4)).astype(np.float32)
    g = np.asarray(elementwise_iou(jnp.asarray(a), jnp.asarray(b), xywh=True, giou=True))
    assert np.all(g <= 1.0 + 1e-6) and np.all(g >= -1.0 - 1e-6)
    same = np.asarray(elementwise_iou(jnp.asarray(a), jnp.asarray(a), xywh=True, giou=True))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)
    # giou <= iou always
    i = np.asarray(elementwise_iou(jnp.asarray(a), jnp.asarray(b), xywh=True))
    assert np.all(g <= i + 1e-6)


def test_pairwise_giou_diag_matches_elementwise():
    rng = np.random.default_rng(3)
    a = rng.uniform(0.1, 0.9, size=(8, 4)).astype(np.float32)
    b = rng.uniform(0.1, 0.9, size=(8, 4)).astype(np.float32)
    pg = np.asarray(pairwise_giou(jnp.asarray(xywh2xyxy(jnp.asarray(a))),
                                  jnp.asarray(xywh2xyxy(jnp.asarray(b)))))
    eg = np.asarray(elementwise_iou(jnp.asarray(a), jnp.asarray(b), xywh=True, giou=True))
    np.testing.assert_allclose(np.diag(pg), eg, atol=1e-5)


def test_inverse_sigmoid_roundtrip():
    x = jnp.linspace(0.01, 0.99, 50)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))),
                               np.asarray(x), atol=1e-4)


def _pos2posemb_torch(pos, num_pos_feats=64, temperature=10000):
    import math
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=pos.dtype)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    posemb = pos[..., None] / dim_t
    posemb = torch.stack((posemb[..., 0::2].sin(), posemb[..., 1::2].cos()),
                         dim=-1).flatten(-3)
    return posemb


def test_pos2posemb_matches_torch():
    rng = np.random.default_rng(4)
    pos = rng.uniform(0, 1, size=(2, 5, 4)).astype(np.float32)
    got = np.asarray(pos2posemb(jnp.asarray(pos)))
    want = _pos2posemb_torch(torch.tensor(pos)).numpy()
    assert got.shape == (2, 5, 256)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_generate_anchors_shapes_and_validity():
    shapes = ((64, 64), (32, 32), (16, 16))
    S = sum(h * w for h, w in shapes)
    anchors, valid = generate_anchors(shapes)
    assert anchors.shape == (1, S, 4)
    assert valid.shape == (1, S, 1)
    a = np.asarray(anchors)[0]
    v = np.asarray(valid)[0, :, 0]
    assert np.all(np.isfinite(a[v]))       # valid anchors finite in logit space
    assert np.all(np.isinf(a[~v]))         # invalid anchors masked to +inf
    assert v.sum() > 0 and (~v).sum() > 0  # both populations present


def _msda_torch(value, shapes, loc, attn):
    """torch oracle via F.grid_sample — the public reference semantics."""
    bs, _, num_heads, d = value.shape
    _, nq, _, L, P, _ = loc.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    samples = []
    for lvl, (h, w) in enumerate(shapes):
        v = value_list[lvl].flatten(2).transpose(1, 2).reshape(bs * num_heads, d, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # bs*H, nq, P, 2
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        samples.append(s)
    attn_t = attn.transpose(1, 2).reshape(bs * num_heads, 1, nq, L * P)
    out = (torch.stack(samples, dim=-2).flatten(-2) * attn_t).sum(-1)
    return out.view(bs, num_heads * d, nq).transpose(1, 2).contiguous()


@pytest.mark.parametrize("dtype", [np.float32])
def test_ms_deform_attn_matches_grid_sample(dtype):
    rng = np.random.default_rng(5)
    shapes = ((12, 16), (6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, Q, H, D, P = 2, 10, 4, 8, 4
    L = len(shapes)
    value = rng.standard_normal((B, S, H, D)).astype(dtype)
    # sampling locations both inside and outside [0,1] to test zero padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)).astype(dtype)
    attn = rng.uniform(0, 1, size=(B, Q, H, L, P)).astype(dtype)
    attn = attn / attn.sum(axis=(-1, -2), keepdims=True)

    got = np.asarray(ms_deform_attn_xla(jnp.asarray(value), shapes,
                                        jnp.asarray(loc), jnp.asarray(attn)))
    want = _msda_torch(torch.tensor(value), shapes, torch.tensor(loc),
                       torch.tensor(attn)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ms_deform_attn_grads():
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, Q, H, D, P = 1, 4, 2, 4, 2
    L = len(shapes)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (B, S, H, D))
    loc = jax.random.uniform(k2, (B, Q, H, L, P, 2), minval=0.1, maxval=0.9)
    attn = jax.nn.softmax(jax.random.normal(k3, (B, Q, H, L, P)).reshape(B, Q, H, -1)
                          ).reshape(B, Q, H, L, P)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    from jax.test_util import check_grads
    check_grads(f, (value, loc, attn), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
