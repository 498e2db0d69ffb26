"""Correctness of the low-channel conv reformulations (round-5 perf work).

`ConvBnAct` routes low-channel k3 convs to `_S2DConv` (stride 2,
space-to-depth + k2) / `_TapConv` (stride 1, 9-tap im2col dot) — see
scripts/backbone_opt_bench.py for the TPU measurements. The param trees
are IDENTICAL to the generic nn.Conv path, so these tests run the same
module with the same variables through both paths (by flipping the
channel gate) and require equality.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mo_yolo_tpu.models import layers


@pytest.fixture
def restore_gate():
    orig = (layers._LOW_CH_S2D, layers._LOW_CH_TAPS)
    yield
    layers._LOW_CH_S2D, layers._LOW_CH_TAPS = orig


def _set_gate(v):
    layers._LOW_CH_S2D = v
    layers._LOW_CH_TAPS = v


@pytest.mark.parametrize("stride,h,w", [(1, 8, 10), (2, 8, 10), (2, 12, 6)])
def test_fast_conv_paths_match_generic(restore_gate, stride, h, w):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, w, 64)), jnp.float32)
    mod = layers.ConvBnAct(48, 3, stride)

    _set_gate(64)                             # fast path on
    v = mod.init(jax.random.PRNGKey(0), x)
    y_fast = mod.apply(v, x)

    _set_gate(0)                              # force generic nn.Conv
    v2 = mod.init(jax.random.PRNGKey(0), x)
    # identical param trees: the generic path must accept the same vars
    assert jax.tree.structure(v2) == jax.tree.structure(v)
    y_ref = mod.apply(v, x)

    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_ref),
                               atol=2e-5)


def test_odd_spatial_falls_back(restore_gate):
    # odd H/W cannot pack 2x2 -> must route to the generic conv and
    # still produce the right shape
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 7, 9, 32)), jnp.float32)
    mod = layers.ConvBnAct(16, 3, 2)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    assert y.shape == (1, 4, 5, 16)


def test_gate_excludes_wide_and_tiny_channels(restore_gate):
    # 3-channel float (stem) and >=128-channel tensors stay on nn.Conv:
    # the variable tree must carry a real nn.Conv param either way, and
    # outputs must have conv shapes
    for c in (3, 128):
        x = jnp.zeros((1, 8, 8, c), jnp.float32)
        mod = layers.ConvBnAct(32, 3, 2)
        v = mod.init(jax.random.PRNGKey(0), x)
        assert v["params"]["conv"]["kernel"].shape == (3, 3, c, 32)
        assert mod.apply(v, x).shape == (1, 4, 4, 32)


def test_grad_flows_through_fast_paths(restore_gate):
    _set_gate(64)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)), jnp.float32)
    for stride in (1, 2):
        mod = layers.ConvBnAct(24, 3, stride)
        v = mod.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return mod.apply({**v, "params": params}, x).sum()

        g = jax.grad(loss)(v["params"])
        gk = np.asarray(g["conv"]["kernel"])
        assert gk.shape == (3, 3, 16, 24)
        assert np.isfinite(gk).all() and np.abs(gk).sum() > 0
