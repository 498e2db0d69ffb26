"""Microbenchmarks grounding the deform-attn kernel redesign (round 4).

Findings recorded here because they shape the kernel design space:

1. Matmul peak on the dev slice, measured by the SLOPE method: time a
   compiled `lax.scan` whose body does K chained matmuls, for K in
   {1, 8}; (t_K8 - t_K1) / 7 removes the fixed per-iteration scan/launch
   overhead that a K=1 measurement folds into the matmul time.

2. `tpu.dynamic_gather` (what `jnp.take_along_axis` lowers to inside a
   Pallas TPU kernel) is a VREG SHUFFLE, not a memory gather: Mosaic
   rejects any gather whose gathered dimension spans more than one
   vreg ("Not implemented: Multiple source vregs along gather
   dimension"), i.e. sublane-gathers only work over tables of <= 8 rows
   (f32) and lane-gathers only over <= 128 columns. A real-gather
   deform-attn formulation over [S_l, H*D] tables (S_l up to 19200) is
   therefore IMPOSSIBLE in this jax/Mosaic version; the one-hot-MXU
   matmul (rows x table FLOPs) remains the only exact in-kernel gather.
   This script compile-probes both small-gather forms so a future
   Mosaic that lifts the restriction is detected by simply re-running.

Run ON TPU: python scripts/micro_peak_bench.py
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(run, iters):
    run()  # compile + warm
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best.append((time.perf_counter() - t0) / iters * 1e3)
    return min(best[1:])  # drop round 1 (relay warm-up)


def scan_chain(m, k, n, dtype, chain, iters=50):
    """ms per scan iteration with `chain` dependent matmuls in the body."""
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), dtype)
    bs = [jax.random.normal(jax.random.PRNGKey(j + 1), (k, n), dtype)
          for j in range(chain)]
    assert k == n or chain == 1, "chained matmuls need square-ish RHS"

    def body(c, i):
        x = a + i.astype(dtype)
        for b in bs:
            x = jnp.dot(x, b, preferred_element_type=dtype)
        return c + x.mean().astype(jnp.float32), None

    @jax.jit
    def run():
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    return timed(run, iters)


def bench_matmul_slope(m, k, n, dtype):
    t1 = scan_chain(m, k, n, dtype, 1)
    t8 = scan_chain(m, k, n, dtype, 8)
    per = (t8 - t1) / 7.0
    tf = 2 * m * k * n / (per * 1e-3) / 1e12
    print(f"matmul {m}x{k}x{n} {dtype.__name__}: {per:.4f} ms/matmul = "
          f"{tf:.1f} TF/s   (K1 iter {t1:.4f} ms -> overhead "
          f"{t1 - per:.4f} ms)")
    return tf


def bench_overhead():
    """Fixed cost of one scan iteration whose body is a trivial add."""
    def body(c, i):
        return c + i, None

    @jax.jit
    def run():
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(2000, dtype=jnp.float32))[0]

    ms = timed(run, 2000)
    print(f"empty scan body: {ms * 1e3:.2f} us/iter")


def _gather_kernel(v_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(v_ref[:], idx_ref[:], axis=0,
                                     mode="promise_in_bounds")


def _gather_lane_kernel(v_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(v_ref[:], idx_ref[:], axis=1,
                                     mode="promise_in_bounds")


def probe_gather(S, N, axis):
    v = jnp.zeros((S, N), jnp.float32)
    idx = jnp.zeros((S, N), jnp.int32)
    kern = _gather_kernel if axis == 0 else _gather_lane_kernel
    try:
        pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(v, idx).block_until_ready()
        print(f"dynamic_gather [{S},{N}] axis={axis}: COMPILES")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        key = next((l for l in msg if "Not implemented" in l
                    or "Unsupported" in l), msg[0] if msg else "?")
        print(f"dynamic_gather [{S},{N}] axis={axis}: REJECTED ({key.strip()[:90]})")
        return False


def main():
    print(f"backend={jax.default_backend()}")
    bench_overhead()
    for dtype in (jnp.bfloat16, jnp.float32):
        bench_matmul_slope(2048, 2048, 2048, dtype)
    bench_matmul_slope(512, 512, 512, jnp.bfloat16)
    # deform-attn kernel shapes (t128 tile: R=512 rows; L0/L1 tables)
    bench_matmul_slope(512, 3200, 3200, jnp.bfloat16)
    # gather probes: sublane-gather beyond one vreg (8 rows f32), lane-
    # gather beyond one vreg (128 cols), and the within-vreg forms
    probe_gather(19200, 256, axis=0)
    probe_gather(8, 256, axis=0)
    probe_gather(256, 128, axis=1)
    probe_gather(256, 256, axis=1)


if __name__ == "__main__":
    main()
