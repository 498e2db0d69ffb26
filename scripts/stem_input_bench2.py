"""Round-2 probes: does the tap-decomposition win generalize?

stem_input_bench found taps(27ch)+1x1 = 0.033 ms vs 1.12 ms for the
shipping k3s2 stem conv. Here:
  g  f32 [B,H,W,3] taps -> 27ch 1x1        (bench.py feeds f32 frames)
  h  bf16 64ch k3 s2 conv (node-1 geometry 768x400x64 -> 384x200x128)
  i  node-1 as taps: 9 slices -> 576ch 1x1
  j  bf16 64ch k3 s1 conv (C2f bottleneck geometry 200x384x64 -> 64)
  k  j as taps: 9 slices -> 576ch 1x1

Run ON TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/stem_input_bench2.py
"""
import time

import jax
import jax.numpy as jnp


def timed_chain(fn, args, chain, iters=20):
    @jax.jit
    def run(*args):
        def body(c, i):
            acc = jnp.float32(0.0)
            for _ in range(chain):
                acc = acc + fn(args, i + acc * 1e-30)
            return c + acc, None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    v = float(run(*args))
    assert v == v
    t = None
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(*args))
        t = (time.perf_counter() - t0) / iters * 1e3
    return t


def slope(fn, args, iters=20):
    return (timed_chain(fn, args, 3, iters) - timed_chain(fn, args, 1, iters)) / 2.0


def conv(x, w, stride, pad=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def taps(x, wf, stride, H, W):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    t = [xp[:, di:di + H:stride, dj:dj + W:stride, :]
         for di in range(3) for dj in range(3)]
    p = jnp.concatenate(t, axis=-1)
    return jax.lax.dot_general(p, wf[None, None],
                               (((3,), (2,)), ((), ())),
                               preferred_element_type=jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    H, W = 800, 1536
    xf32 = jax.random.uniform(key, (1, H, W, 3), jnp.float32)
    w3 = (jax.random.normal(key, (3, 3, 3, 64)) * 0.1).astype(jnp.bfloat16)
    wf3 = jnp.concatenate([w3[i, j] for i in range(3) for j in range(3)], 0)

    def g(ar, t):
        x, w = ar
        return taps((x + t * 1e-9).astype(jnp.bfloat16), w, 2, H, W
                    ).sum().astype(jnp.float32)

    H1, W1 = 400, 768
    x64 = jax.random.uniform(key, (1, H1, W1, 64), jnp.float32
                             ).astype(jnp.bfloat16)
    w64 = (jax.random.normal(key, (3, 3, 64, 128)) * 0.05).astype(jnp.bfloat16)
    wf64 = jnp.concatenate([w64[i, j] for i in range(3) for j in range(3)], 0)

    def h(ar, t):
        x, w = ar
        return conv(x + t.astype(jnp.bfloat16) * 1e-9, w, 2
                    ).sum().astype(jnp.float32)

    def i(ar, t):
        x, w = ar
        return taps(x + t.astype(jnp.bfloat16) * 1e-9, w, 2, H1, W1
                    ).sum().astype(jnp.float32)

    H2, W2 = 200, 384
    xb = jax.random.uniform(key, (1, H2, W2, 64), jnp.float32
                            ).astype(jnp.bfloat16)
    wb = (jax.random.normal(key, (3, 3, 64, 64)) * 0.05).astype(jnp.bfloat16)
    wfb = jnp.concatenate([wb[i, j] for i in range(3) for j in range(3)], 0)

    def j(ar, t):
        x, w = ar
        return conv(x + t.astype(jnp.bfloat16) * 1e-9, w, 1
                    ).sum().astype(jnp.float32)

    def k(ar, t):
        x, w = ar
        return taps(x + t.astype(jnp.bfloat16) * 1e-9, w, 1, H2, W2
                    ).sum().astype(jnp.float32)

    for name, fn, ar in [("g f32 stem taps", g, (xf32, wf3)),
                         ("h node1 conv k3s2 64ch", h, (x64, w64)),
                         ("i node1 taps 576ch", i, (x64, wf64)),
                         ("j C2f conv k3s1 64ch", j, (xb, wb)),
                         ("k C2f taps 576ch", k, (xb, wfb))]:
        try:
            print(f"  {name:24s} {slope(fn, ar):7.3f} ms", flush=True)
        except Exception as ex:
            print(f"  {name:24s} FAILED: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
