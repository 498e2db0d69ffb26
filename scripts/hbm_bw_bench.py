"""HBM bandwidth + per-iteration-overhead probes for the dev slice.

Companion to micro_peak_bench.py. Questions answered:

1. What is achievable HBM bandwidth (big elementwise read passes, slope
   method: body does K independent passes over distinct buffers)?
2. What is the mystery ~0.5 ms fixed cost seen in K=1 matmul scan
   bodies — is it the `mean()` reduction, the `a + i` materialization,
   or something relay-specific? Each candidate is isolated.

NOTE: buffers must be jit ARGUMENTS, not closure constants — captured
constants are embedded in the compile payload and the relay rejects
bodies over the HTTP size limit (413).

Run ON TPU: python scripts/hbm_bw_bench.py
"""
import time

import jax
import jax.numpy as jnp


def timed(run, iters, *args):
    # float() forces a host fetch: block_until_ready does NOT synchronize
    # through the axon relay (dispatch-only timing otherwise).
    float(run(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return min(best[1:])


def bench_copy_slope(mb=64, dtype=jnp.float32):
    """K independent full-read passes per iteration; slope = one pass."""
    n = mb * 1024 * 1024 // jnp.dtype(dtype).itemsize
    bufs = [jax.random.normal(jax.random.PRNGKey(j), (n,), dtype)
            for j in range(8)]

    def make(k):
        @jax.jit
        def run(*bufs):
            def body(c, i):
                acc = c
                for j in range(k):
                    acc = acc + (bufs[j] * i).sum().astype(jnp.float32)
                return acc, None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(30, dtype=jnp.float32))[0]
        return run

    t1 = timed(make(1), 30, *bufs)
    t8 = timed(make(8), 30, *bufs)
    per = (t8 - t1) / 7.0
    bw = mb / (per * 1e-3) / 1024  # one full read per pass
    print(f"read {mb}MB {jnp.dtype(dtype).name}: {per:.4f} ms/pass = "
          f"{bw:.0f} GB/s (K1 iter {t1:.4f} ms)")


def bench_reduce_only(mb=16):
    """Is a full-array mean() the 0.5 ms K1 overhead?"""
    n = mb * 1024 * 1024 // 4
    a = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)

    def make(k):
        @jax.jit
        def run(a):
            def body(c, i):
                acc = c
                for j in range(k):
                    acc = acc + (a + i + j).mean()
                return acc, None
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(30, dtype=jnp.float32))[0]
        return run

    t1 = timed(make(1), 30, a)
    t8 = timed(make(8), 30, a)
    per = (t8 - t1) / 7.0
    print(f"add+mean {mb}MB: {per:.4f} ms/pass (K1 iter {t1:.4f} ms -> "
          f"fixed {t1 - per:.4f} ms)")


def bench_matmul_nomean(m=2048, dtype=jnp.bfloat16):
    """Matmul chain WITHOUT the mean(): carry a full matrix instead."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, m), dtype)
    bs = [jax.random.normal(jax.random.PRNGKey(j + 1), (m, m), dtype)
          for j in range(8)]

    def make(k):
        @jax.jit
        def run(a, *bs):
            def body(x, i):
                for j in range(k):
                    x = jnp.dot(x, bs[j], preferred_element_type=dtype)
                return x * 0.999, None
            x = jax.lax.scan(body, a, jnp.arange(30, dtype=jnp.float32))[0]
            return x[0, 0]
        return run

    t1 = timed(make(1), 30, a, *bs)
    t8 = timed(make(8), 30, a, *bs)
    per = (t8 - t1) / 7.0
    tf = 2 * m ** 3 / (per * 1e-3) / 1e12
    print(f"matmul-nomean {m}^3 {jnp.dtype(dtype).name}: {per:.4f} ms = "
          f"{tf:.1f} TF/s (K1 iter {t1:.4f} ms -> fixed {t1 - per:.4f} ms)")


def main():
    print(f"backend={jax.default_backend()}")
    bench_copy_slope(64, jnp.float32)
    bench_copy_slope(64, jnp.bfloat16)
    bench_reduce_only(16)
    bench_matmul_nomean()


if __name__ == "__main__":
    main()
