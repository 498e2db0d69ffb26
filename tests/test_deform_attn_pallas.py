"""Pallas deformable-attention kernel parity vs the pure-XLA oracle
(interpret mode on CPU; the same pair runs compiled on TPU). Mirrors the
reference's CUDA-vs-pytorch test methodology (`MOTR/models/ops/test.py`)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.deform_attn import ms_deform_attn_xla


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernel in the Pallas interpreter on CPU
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _rand_inputs(B=1, Q=70, H=2, D=8, P=4, shapes=((12, 16), (6, 8), (3, 4)),
                 seed=0):
    rng = np.random.default_rng(seed)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.standard_normal((B, S, H, D)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, (B, Q, H, L, P, 2)).astype(np.float32)
    attn = rng.uniform(0, 1, (B, Q, H, L, P)).astype(np.float32)
    attn /= attn.sum(axis=(-1, -2), keepdims=True)
    return (jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))


def test_pallas_matches_oracle():
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    value, shapes, loc, attn = _rand_inputs()
    got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, attn))
    want = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pallas_query_padding_edge():
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    # Q exactly a multiple of the tile and Q < tile
    for Q in (64, 10):
        value, shapes, loc, attn = _rand_inputs(Q=Q, seed=Q)
        got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, attn))
        want = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
        assert got.shape == want.shape == (1, Q, 16)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pallas_out_of_bounds_zero():
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    value, shapes, loc, attn = _rand_inputs(Q=8, seed=3)
    loc = jnp.full_like(loc, 3.0)  # far outside every level
    got = np.asarray(ms_deform_attn_pallas(value, shapes, loc, attn))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_pallas_grads_match_oracle():
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    value, shapes, loc, attn = _rand_inputs(Q=12)

    def f_pl(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)

    def f_xla(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(value, loc, attn)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-2)


def test_pallas_grads_multi_tile_accumulation():
    """Q spanning multiple query tiles exercises the backward kernel's
    d_value accumulation across grid steps (init at q==0, += after)."""
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    value, shapes, loc, attn = _rand_inputs(Q=130, seed=9)  # 3 tiles of 64

    def f_pl(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)

    def f_xla(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(value, loc, attn)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-2)


def test_pallas_grads_out_of_range_and_batch():
    """Out-of-range sampling points must produce zero grads everywhere they
    contribute nothing (grid_sample zeros semantics), incl. batched input."""
    from mo_yolo_tpu.ops.deform_attn_pallas import ms_deform_attn_pallas
    value, shapes, loc, attn = _rand_inputs(B=2, Q=16, seed=5)
    loc = jnp.where(jnp.arange(loc.shape[1])[None, :, None, None, None, None]
                    % 2 == 0, 3.0, loc)  # half the queries far out of range

    def f_pl(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)

    def f_xla(v, l, a):
        return jnp.sum(ms_deform_attn_xla(v, shapes, l, a) ** 2)

    g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(value, loc, attn)
    g_xla = jax.grad(f_xla, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-2)


# ----------------------------------------------------------------------
# one-hot-matmul XLA path (round-4 hot path, `ms_deform_attn_onehot`)
# ----------------------------------------------------------------------

def test_onehot_matches_oracle():
    from mo_yolo_tpu.ops.deform_attn import ms_deform_attn_onehot
    value, shapes, loc, attn = _rand_inputs()
    got = np.asarray(ms_deform_attn_onehot(value, shapes, loc, attn))
    want = np.asarray(ms_deform_attn_xla(value, shapes, loc, attn))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_onehot_out_of_bounds_zero():
    from mo_yolo_tpu.ops.deform_attn import ms_deform_attn_onehot
    value, shapes, loc, attn = _rand_inputs(Q=8, seed=3)
    loc = jnp.full_like(loc, 3.0)  # far outside every level
    got = np.asarray(ms_deform_attn_onehot(value, shapes, loc, attn))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_onehot_grads_match_oracle():
    from mo_yolo_tpu.ops.deform_attn import ms_deform_attn_onehot
    value, shapes, loc, attn = _rand_inputs(Q=20, seed=5)

    def f(fn):
        def loss(v, l, a):
            return jnp.sum(fn(v, shapes, l, a) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(value, loc, attn)

    g_one = f(lambda v, s, l, a: ms_deform_attn_onehot(v, s, l, a))
    g_ora = f(ms_deform_attn_xla)
    for a, b in zip(g_one, g_ora):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)
