"""Deform-attn impl comparison across input shapes.

The Pallas one-hot-MXU kernel was tuned at 640x640 (8,400 feature
tokens); the headline bench now runs MOTR's own 1536x800 (25,200
tokens), where the one-hot matmul FLOPs scale with token count while
the XLA gather oracle scales with sample count only. This measures
ms/call of both impls at both shapes to pick the right default per
shape.

Method per the harness perf rules: one compiled `lax.scan` with
loop-VARIANT sampling locations (hoisting guard), timing synced by a
real host fetch (block_until_ready does not synchronize through the
axon relay), two rounds, trust the second.

Run ON TPU: plain `python scripts/kernel_study_shapes.py`.
"""
import argparse
import time

import jax
import jax.numpy as jnp

from mo_yolo_tpu.ops.deform_attn import ms_deform_attn


def level_shapes(h: int, w: int):
    return tuple((h // s, w // s) for s in (8, 16, 32))


def bench_impl(impl: str, h: int, w: int, q: int = 600, heads: int = 8,
               d: int = 32, p: int = 4, iters: int = 50,
               dtype=jnp.bfloat16) -> float:
    shp = level_shapes(h, w)
    S = sum(a * b for a, b in shp)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    v = jax.random.normal(k1, (1, S, heads, d), dtype)
    loc = jax.random.uniform(k2, (1, q, heads, len(shp), p, 2),
                             jnp.float32, 0.05, 0.95)
    aw = jax.nn.softmax(
        jax.random.normal(k3, (1, q, heads, len(shp), p)),
        axis=-1).astype(dtype)

    def body(c, i):
        l2 = jnp.clip(loc + i * 1e-6, 0.0, 1.0)
        o = ms_deform_attn(v, shp, l2, aw, impl=impl)
        return c + o.mean().astype(jnp.float32), None

    @jax.jit
    def run():
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    float(run())                      # compile + relay warm-up
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        val = float(run())            # host fetch = real sync
        times.append((time.perf_counter() - t0) / iters * 1e3)
    assert val == val, "nan"
    return times[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=600)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} q={args.q}")
    for (h, w) in ((640, 640), (800, 1536)):
        row = {}
        for impl in ("xla", "pallas"):
            try:
                row[impl] = bench_impl(impl, h, w, q=args.q,
                                       iters=args.iters)
            except Exception as e:  # kernel may reject a shape
                row[impl] = float("nan")
                print(f"  {impl} failed at {h}x{w}: {e}")
        S = sum(a * b for a, b in level_shapes(h, w))
        print(f"{w}x{h} (S={S}): xla {row['xla']:.3f} ms  "
              f"pallas {row['pallas']:.3f} ms  "
              f"ratio pallas/xla {row['pallas']/row['xla']:.2f}")


if __name__ == "__main__":
    main()
