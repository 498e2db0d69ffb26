"""Stem INPUT-side probes (round 4, follow-up to stem_bench.py).

stem_bench showed math rewrites (space-to-depth etc.) don't beat the
baseline k3s2 conv. backbone_layer_bench shows the stem costs 1.31 ms at
1536x800 — ~20x its unpadded bandwidth bound. Hypothesis: the [B,H,W,3]
input's trailing dim of 3 is lane-padded to 128 in HBM, so the conv reads
~43x the payload bytes. These probes vary the INPUT dtype/layout only
(the conv is the shipping nn.Conv formulation in every variant):

  a  f32  [B,H,W,3] -> conv                  (what bench.py measures today)
  b  bf16 [B,H,W,3] -> conv                  (half the padded bytes)
  c  u8   [B,H,W,3] -> f32/255 -> conv       (quarter; real streaming input)
  d  u8   [B,H,W,3] -> bf16/255 -> conv
  e  u8   [B,H,W*3] flat -> reshape -> bf16/255 -> conv  (unpadded HBM src)
  f  taps: u8 -> 9 strided HxW tap slices -> concat(27ch) -> 1x1 conv
     (im2col in XLA; trades one padded read for nine smaller ones)

Slope method (chain-3 minus chain-1) so relay dispatch cost cancels.
Run ON TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/stem_input_bench.py
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


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


def conv64(x, w, stride=2, pad=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", default="1536x800")
    args = ap.parse_args()
    W, H = (int(v) for v in args.imgsz.split("x"))
    key = jax.random.PRNGKey(0)
    xu8 = jax.random.randint(key, (1, H, W, 3), 0, 255, jnp.uint8)
    xf32 = xu8.astype(jnp.float32) / 255.0
    xbf = xf32.astype(jnp.bfloat16)
    xflat = xu8.reshape(1, H, W * 3)
    w3 = (jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)

    def a(ar, t):
        x, w = ar
        return conv64((x + t * 1e-9).astype(jnp.bfloat16), w).sum().astype(jnp.float32)

    def b(ar, t):
        x, w = ar
        return conv64(x + t.astype(jnp.bfloat16) * 1e-9, w).sum().astype(jnp.float32)

    def c(ar, t):
        x, w = ar
        xn = x.astype(jnp.float32) * (1 / 255.0) + t * 1e-9
        return conv64(xn.astype(jnp.bfloat16), w).sum().astype(jnp.float32)

    def d(ar, t):
        x, w = ar
        xn = x.astype(jnp.bfloat16) * jnp.bfloat16(1 / 255.0) + t.astype(jnp.bfloat16) * 1e-9
        return conv64(xn, w).sum().astype(jnp.float32)

    def e(ar, t):
        x, w = ar
        xn = x.reshape(1, H, W, 3).astype(jnp.bfloat16) * jnp.bfloat16(1 / 255.0)
        return conv64(xn + t.astype(jnp.bfloat16) * 1e-9, w).sum().astype(jnp.float32)

    # f: explicit tap decomposition. Output (i,j) needs input (2i+di-1, 2j+dj-1).
    # Pad u8 by 1, slice 9 strided taps [H/2, W/2, 3], concat -> 27ch, 1x1 conv.
    w27 = w3.reshape(9 * 3, 64).reshape(3, 3, 3, 64).transpose(0, 1, 2, 3)
    wf = jnp.concatenate([w3[i, j] for i in range(3) for j in range(3)], 0)  # [27,64]

    def f(ar, t):
        x, w = ar  # x: u8 [1,H,W,3]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [xp[:, di:di + H:2, dj:dj + W:2, :] for di in range(3) for dj in range(3)]
        p = jnp.concatenate(taps, axis=-1).astype(jnp.bfloat16) * jnp.bfloat16(1 / 255.0)
        y = jax.lax.dot_general(p + t.astype(jnp.bfloat16) * 1e-9, w[None, None],
                                ((( 3,), (2,)), ((), ())),
                                preferred_element_type=jnp.bfloat16)
        return y.sum().astype(jnp.float32)

    for name, fn, ar in [("a f32 in", a, (xf32, w3)),
                         ("b bf16 in", b, (xbf, w3)),
                         ("c u8 in, f32 norm", c, (xu8, w3)),
                         ("d u8 in, bf16 norm", d, (xu8, w3)),
                         ("e u8 FLAT in", e, (xflat, w3)),
                         ("f u8 taps->27ch 1x1", f, (xu8, wf))]:
        try:
            print(f"  {name:22s} {slope(fn, ar):7.3f} ms", flush=True)
        except Exception as ex:
            print(f"  {name:22s} FAILED: {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
