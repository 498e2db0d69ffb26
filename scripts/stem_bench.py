"""Stem-conv microbench (round 4): why node 0 costs 1.24 ms.

The backbone stem (Conv 3->64 k3 s2, `yolo_track.yaml` row 0) runs at <1%
MXU utilization at 1536x800 — 3 input channels leave the MXU contraction
dim 97% padding. Candidates (all mathematically exact rewrites of the same
conv, weights derivable from the original [3,3,3,64] kernel):

  v0  baseline nn.Conv k3 s2 p1                 (what ships today)
  v1  space-to-depth(2) + k2 s1 conv, 12 ch     (fold 2x2 blocks into ch)
  v2  k4 s2 conv with zero-padded kernel        (alignment-only variant)
  v3  s2d(2) as strided-slice concat + k2 s1    (avoids the 6D transpose)
  v4  s2d(4) + k1 s1 conv, 48 ch — NOT exact for k3 (receptive field
      crosses 4-blocks); timed as the util ceiling only.

Run ON TPU: PYTHONPATH=. python scripts/stem_bench.py [--imgsz WxH]
"""
import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=30):
    r = fn(*args); r.block_until_ready(); float(r.sum())
    t = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(r.sum())
        t = (time.perf_counter() - t0) / iters * 1e3
    return t


def conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)


def fold_s2d2(w):
    """[3,3,C,O] k3s2 kernel -> [2,2,4C,O] k2s1 kernel over 2x2-block
    channels (block offset bi/bj in {0,1}, in-block pos pi/pj in {0,1};
    original tap offset = 2*b + p - 2, valid iff in {-1,0,1})."""
    C, O = w.shape[2], w.shape[3]
    out = np.zeros((2, 2, 4 * C, O), np.float32)
    wn = np.asarray(w, np.float32)
    for bi in range(2):
        for pi in range(2):
            ri = 2 * bi + pi - 1        # kernel row index (offset+1)
            if not 0 <= ri <= 2:
                continue
            for bj in range(2):
                for pj in range(2):
                    rj = 2 * bj + pj - 1
                    if not 0 <= rj <= 2:
                        continue
                    out[bi, bj, (pi * 2 + pj) * C:(pi * 2 + pj + 1) * C] = \
                        wn[ri, rj]
    return out


def s2d2(x):
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def s2d2_slices(x):
    return jnp.concatenate(
        [x[:, i::2, j::2] for i in (0, 1) for j in (0, 1)], axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", default="1536x800")
    args = ap.parse_args()
    w_, h_ = (int(v) for v in args.imgsz.split("x"))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, h_, w_, 3), jnp.float32)
    w3 = jax.random.normal(key, (3, 3, 3, 64), jnp.float32) * 0.1

    @jax.jit
    def v0(x, w):
        return conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), 2,
                    ((1, 1), (1, 1)))

    wf = jnp.asarray(fold_s2d2(w3))

    @jax.jit
    def v1(x, wf):
        y = s2d2(x.astype(jnp.bfloat16))
        return conv(y, wf.astype(jnp.bfloat16), 1, ((1, 0), (1, 0)))

    w4 = jnp.zeros((4, 4, 3, 64), jnp.float32).at[1:, 1:].set(w3)

    @jax.jit
    def v2(x, w):
        return conv(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), 2,
                    ((2, 1), (2, 1)))

    @jax.jit
    def v3(x, wf):
        y = s2d2_slices(x.astype(jnp.bfloat16))
        return conv(y, wf.astype(jnp.bfloat16), 1, ((1, 0), (1, 0)))

    w1 = jax.random.normal(key, (1, 1, 48, 64), jnp.float32) * 0.1

    @jax.jit
    def v4(x, w):
        B, H, W, C = x.shape
        y = x.astype(jnp.bfloat16).reshape(B, H // 4, 4, W // 4, 4, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 4, W // 4, 16 * C)
        return conv(y, w.astype(jnp.bfloat16), 1, ((0, 0), (0, 0)))

    y0 = np.asarray(v0(x, w3), np.float32)
    y1 = np.asarray(v1(x, wf), np.float32)
    y2 = np.asarray(v2(x, w4), np.float32)
    y3 = np.asarray(v3(x, wf), np.float32)
    print("v1 max|err|:", np.abs(y0 - y1).max(),
          " v2:", np.abs(y0 - y2).max(), " v3:", np.abs(y0 - y3).max())

    for name, fn, a in [("v0 baseline k3s2", v0, (x, w3)),
                        ("v1 s2d2+k2s1", v1, (x, wf)),
                        ("v2 k4s2 padded", v2, (x, w4)),
                        ("v3 s2d2-slices+k2s1", v3, (x, wf)),
                        ("v4 s2d4+k1 (ceiling)", v4, (x, w1))]:
        print(f"  {name:22s} {timed(fn, a):7.3f} ms")


if __name__ == "__main__":
    main()
