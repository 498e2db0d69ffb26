"""On-chip deform-attn kernel performance regression gate (round-4
VERDICT item #9).

The round-4 kernel-variant study (`scripts/kernel_variants_bench.py`,
STATUS.md §"Kernel variant study") established that the one-hot matmul
formulation in plain XLA with a bf16 dot output ("vx3", shipped as the
`impl='onehot'` TPU default) beats the fused Pallas kernel at every bench
shape.  A future JAX/XLA bump that de-optimizes the one-hot dot would
silently drop the frame rate ~2x; this pins the measured r4 numbers as a
band so the change shows up in the suite instead of in a lost round.

Measured r4 values on the dev-slice chip (slope method, q=600, bf16):

    shape       onehot(vx3)   pallas
    640x640     0.33 ms       1.13 ms
    1536x800    0.48 ms       1.33 ms

The harness's pytest runs force the CPU backend (tests/axon_guard.py), so
under pytest this is slow-marked AND tpu-gated; on this harness run it as
a plain script against the tunnel chip:

    python tests/test_kernel_perf_regression.py
"""

import time

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.deform_attn import ms_deform_attn

# r4 measured ms/call on the dev-slice chip; the assertion band is x1.6
# to absorb compile-to-compile scheduling noise without letting a 2x
# regression through
R4_ONEHOT_MS = {(640, 640): 0.33, (800, 1536): 0.48}
BAND = 1.6


def _inputs(h, w, q=600, heads=8, d=32, p=4, dtype=jnp.bfloat16):
    shapes = tuple((h // s, w // s) for s in (8, 16, 32))
    S = sum(a * b for a, b in shapes)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    v = jax.random.normal(k1, (1, S, heads, d), dtype)
    loc = jax.random.uniform(k2, (1, q, heads, len(shapes), p, 2),
                             jnp.float32, 0.05, 0.95)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (1, q, heads, len(shapes), p)),
        axis=-1).astype(dtype)
    return v, shapes, loc, aw


def _timed_chain(impl, v, shapes, loc, aw, chain, iters=30):
    """ms per scan iteration with `chain` serialized calls in the body
    (loop-variant inputs so XLA cannot hoist; one compiled dispatch so
    the relay's fixed per-dispatch cost cancels in the slope)."""

    @jax.jit
    def run(v, loc, aw):
        def body(c, i):
            l2 = jnp.clip(loc + i * 1e-6, 0.0, 1.0)
            acc = jnp.float32(0.0)
            for k in range(chain):
                o = ms_deform_attn(v, shapes, l2, aw, impl=impl)
                m = o.mean().astype(jnp.float32)
                acc = acc + m
                l2 = jnp.clip(l2 + m * 1e-30 + k * 1e-7, 0.0, 1.0)
            return c + acc, None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    assert np.isfinite(float(run(v, loc, aw)))
    t = None
    for _ in range(2):          # first round carries relay warm-up
        t0 = time.perf_counter()
        float(run(v, loc, aw))
        t = (time.perf_counter() - t0) / iters * 1e3
    return t


def _slope_ms(impl, h, w):
    v, shapes, loc, aw = _inputs(h, w)
    t1 = _timed_chain(impl, v, shapes, loc, aw, 1)
    t3 = _timed_chain(impl, v, shapes, loc, aw, 3)
    return (t3 - t1) / 2.0


def check_regression(h, w):
    onehot = _slope_ms("onehot", h, w)
    pallas = _slope_ms("pallas", h, w)
    print(f"{w}x{h}: onehot {onehot:.3f} ms/call, pallas {pallas:.3f} "
          f"(r4 pinned {R4_ONEHOT_MS[(h, w)]:.2f})")
    # the shipped auto-default must not lose to the Pallas fallback
    assert onehot <= pallas * 1.05, (
        f"one-hot ({onehot:.3f} ms) slower than Pallas ({pallas:.3f} ms) "
        f"at {w}x{h}: the impl auto-selection is stale")
    # and must stay inside the band of the r4 measurement
    pinned = R4_ONEHOT_MS[(h, w)]
    assert onehot <= pinned * BAND, (
        f"one-hot deform-attn regressed: {onehot:.3f} ms vs pinned "
        f"{pinned:.2f} ms (x{BAND} band) at {w}x{h}")
    return onehot, pallas


@pytest.mark.slow
@pytest.mark.parametrize("h,w", [(640, 640), (800, 1536)])
def test_deform_attn_perf_regression(h, w):
    if jax.default_backend() != "tpu":
        pytest.skip("on-chip perf gate: requires a real TPU backend")
    check_regression(h, w)


if __name__ == "__main__":       # plain-python on-chip entry (axon tunnel)
    print(f"backend={jax.default_backend()}")
    assert jax.default_backend() == "tpu", "run this against a TPU"
    for (h, w) in R4_ONEHOT_MS:
        check_regression(h, w)
    print("kernel perf regression gate: OK")
