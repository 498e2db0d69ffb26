"""Round-5 backbone/neck optimization probes (VERDICT item #5).

The round-4 per-node study put backbone+neck at 5.18 ms of the 9.64 ms
frame at 1536x800 (stem since solved by the u8 tap-stem). This script
probes the remaining cost centers against algebraically-equivalent
reformulations, on random tensors (no model rebuild needed):

  h0  node-1 geometry: k3s2 conv 64->128 @768x400 (as shipped)
  h1  the same conv as space-to-depth: pack 2x2 -> [384,200,256],
      k2s1 conv with the rearranged (quarter-zero) kernel. 1.78x the
      FLOPs but full-lane layouts; wins iff h0 runs <56% utilization.
  j0  C2f bottleneck geometry: k3s1 conv 64->64 @384x200 (as shipped)
  j64/j128  the same contraction with wider channels for scaling ref
  m0  neck seam (nodes 10-12 head): up2x(P5 [48x25x512]) -> concat with
      P4 [96x50x512] -> 1x1 conv 1024->512 (as shipped)
  m1  seam with the upsample COMMUTED through the 1x1 conv: the P5 half
      of cv1 runs at /32 resolution, then up2x, then add the P4 half.
      (nearest-up and 1x1 conv commute exactly.)
  c0  full C2f(128, n=3, shortcut) @ /4 geometry — the single biggest
      non-stem node of the round-4 study (1.03 ms)

Each probe prints measured ms and its bandwidth/compute roofline.

Run ON TPU: python scripts/backbone_opt_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

PEAK_TF = 197e12
PEAK_BW = 600e9


def timed_chain(fn, args, chain, iters=20):
    """fn returns the probe's raw output tensor; the harness reduces it
    through abs() — sum-of-a-linear-op is algebraically collapsible and
    XLA DID collapse it (first run of this script measured a 20-GFLOP
    conv at 0.010 ms); abs() blocks that strength reduction."""
    @jax.jit
    def run(*args):
        def body(c, i):
            acc = jnp.float32(0.0)
            for _ in range(chain):
                y = fn(args, i + acc * 1e-30)
                acc = acc + jnp.abs(y).sum().astype(jnp.float32)
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


def slope(fn, args, iters=150):
    return (timed_chain(fn, args, 3, iters) -
            timed_chain(fn, args, 1, iters)) / 2.0


def conv(x, w, stride=1, pad=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def s2d(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C]; channel block index = 2*a+b for
    spatial offset (a,b)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def pack_kernel_s2d(w):
    """k3 s2 kernel [3,3,C,F] -> equivalent k2 s1 kernel over the packed
    tensor [2,2,4C,F]: w2[p,q,(2a+b)C+c,f] = w[2p+a-1, 2q+b-1, c, f]
    (out-of-range taps are zero — a quarter of the packed kernel)."""
    C, F = w.shape[2], w.shape[3]
    w2 = np.zeros((2, 2, 4 * C, F), np.float32)
    wn = np.asarray(w, np.float32)
    for p in range(2):
        for a in range(2):
            u = 2 * p + a - 1
            if not 0 <= u <= 2:
                continue
            for q in range(2):
                for b in range(2):
                    vv = 2 * q + b - 1
                    if not 0 <= vv <= 2:
                        continue
                    w2[p, q, (2 * a + b) * C:(2 * a + b + 1) * C, :] = \
                        wn[u, vv]
    return jnp.asarray(w2)


def roofline(flops, bytes_):
    return max(flops / PEAK_TF, bytes_ / PEAK_BW) * 1e3


def main():
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # ---------------- h: node-1 k3s2 64->128 @768x400
    x1 = jnp.asarray(rng.standard_normal((1, 400, 768, 64)), bf)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05, bf)

    def h0(a, t):
        x, w = a
        return conv(x + t.astype(bf) * bf(1e-6), w, stride=2)

    # parity check of the s2d formulation (f32, small)
    xs = jnp.asarray(rng.standard_normal((1, 16, 20, 64)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 3, 64, 128)) * 0.05, jnp.float32)
    ref = conv(xs, ws, stride=2)
    # pad the UNPACKED tensor by 2 top/left == pad the packed one by 1;
    # k2s1/pad0 output i then reads packed rows (i-1, i) — exactly the
    # stride-2 window of out(i)
    alt = conv(s2d(jnp.pad(xs, ((0, 0), (2, 0), (2, 0), (0, 0)))),
               pack_kernel_s2d(ws), stride=1, pad=0)
    err = float(jnp.max(jnp.abs(ref - alt)))
    print(f"s2d parity: {err:.2e}")
    assert err < 1e-3

    x1p = s2d(jnp.pad(x1, ((0, 0), (2, 0), (2, 0), (0, 0))))
    w1p = pack_kernel_s2d(w1).astype(bf)

    def h1(a, t):
        x, w = a
        return conv(x + t.astype(bf) * bf(1e-6), w, stride=1, pad=0)

    fl_h = 2 * 200 * 384 * 128 * 9 * 64
    by_h = (400 * 768 * 64 + 200 * 384 * 128) * 2
    print(f"h0 k3s2 64->128:  {slope(h0, (x1, w1)):7.3f} ms "
          f"(roofline {roofline(fl_h, by_h):.3f})")
    print(f"h1 s2d k2s1:      {slope(h1, (x1p, w1p)):7.3f} ms "
          f"(roofline {roofline(fl_h * 16 / 9, by_h):.3f})")

    # ---------------- j: bottleneck k3s1 64->64 @200x384 (+ channel scaling)
    for C in (64, 128, 256):
        xj = jnp.asarray(rng.standard_normal((1, 200, 384, C)), bf)
        wj = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, bf)

        def j0(a, t):
            x, w = a
            return conv(x + t.astype(bf) * bf(1e-6), w)

        fl = 2 * 200 * 384 * C * 9 * C
        by = (200 * 384 * C * 2) * 2
        print(f"j k3s1 {C:3d}->{C:3d}:   {slope(j0, (xj, wj)):7.3f} ms "
              f"(roofline {roofline(fl, by):.3f})")

    # ---------------- m: neck seam up2x + concat + 1x1
    p5 = jnp.asarray(rng.standard_normal((1, 25, 48, 512)), bf)
    p4 = jnp.asarray(rng.standard_normal((1, 50, 96, 512)), bf)
    wm = jnp.asarray(rng.standard_normal((1, 1, 1024, 512)) * 0.03, bf)

    def up2(x):
        B, H, W, C = x.shape
        return jnp.broadcast_to(x[:, :, None, :, None, :],
                                (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)

    def m0(a, t):
        a5, a4, w = a
        y = jnp.concatenate([up2(a5 + t.astype(bf) * bf(1e-6)), a4], -1)
        return conv(y, w, pad=0)

    def m1(a, t):
        a5, a4, w = a
        lo = conv(a5 + t.astype(bf) * bf(1e-6), w[:, :, :512, :], pad=0)
        hi = conv(a4, w[:, :, 512:, :], pad=0)
        return (up2(lo) + hi)

    # parity
    pm0 = jnp.concatenate([up2(p5), p4], -1)
    d = float(jnp.max(jnp.abs(
        conv(pm0, wm, pad=0) -
        (up2(conv(p5, wm[:, :, :512, :], pad=0)) +
         conv(p4, wm[:, :, 512:, :], pad=0)))))
    print(f"seam-commute parity: {d:.2e}")

    print(f"m0 up+cat+1x1:    {slope(m0, (p5, p4, wm)):7.3f} ms")
    print(f"m1 commuted:      {slope(m1, (p5, p4, wm)):7.3f} ms")

    # ---------------- every stride-2 conv geometry in yolo_track.yaml,
    # as-shipped vs s2d (node index: in-ch -> out-ch @ input HxW)
    for tag, (Hh, Ww, Ci, Co) in {
            "n1 @768x400  64->128": (400, 768, 64, 128),
            "n3 @384x200 128->256": (200, 384, 128, 256),
            "n5 @192x100 256->512": (100, 192, 256, 512),
            "n7 @96x50  512->512": (50, 96, 512, 512),
    }.items():
        xg = jnp.asarray(rng.standard_normal((1, Hh, Ww, Ci)), bf)
        wg = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.05, bf)

        def g0(a, t):
            x, w = a
            return conv(x + t.astype(bf) * bf(1e-6), w, stride=2)

        xgp = s2d(jnp.pad(xg, ((0, 0), (2, 0), (2, 0), (0, 0))))
        wgp = pack_kernel_s2d(wg).astype(bf)

        def g1(a, t):
            x, w = a
            return conv(x + t.astype(bf) * bf(1e-6), w, stride=1, pad=0)

        fl = 2 * (Hh // 2) * (Ww // 2) * Co * 9 * Ci
        by = (Hh * Ww * Ci + (Hh // 2) * (Ww // 2) * Co) * 2
        print(f"{tag}: conv {slope(g0, (xg, wg)):7.3f}  "
              f"s2d {slope(g1, (xgp, wgp)):7.3f}  "
              f"(roofline {roofline(fl, by):.3f})", flush=True)

    # ---------------- taps (im2col) re-probe with the abs harness —
    # the round-4 "taps lose for >=64ch" verdict came from the elidable
    # sum harness (stem_input_bench2.py), so re-measure honestly
    def taps(x, wf, stride, Hh, Ww):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        t = [xp[:, di:di + Hh:stride, dj:dj + Ww:stride, :]
             for di in range(3) for dj in range(3)]
        p = jnp.concatenate(t, axis=-1)
        return jax.lax.dot_general(p, wf[None, None],
                                   (((3,), (2,)), ((), ())),
                                   preferred_element_type=bf)

    wf1 = jnp.concatenate([w1[i, j] for i in range(3) for j in range(3)], 0)

    def t1(a, t):
        x, w = a
        return taps(x + t.astype(bf) * bf(1e-6), w, 2, 400, 768)

    print(f"t1 node1 taps576: {slope(t1, (x1, wf1)):7.3f} ms", flush=True)

    xj = jnp.asarray(rng.standard_normal((1, 200, 384, 64)), bf)
    wj = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, bf)
    wfj = jnp.concatenate([wj[i, j] for i in range(3) for j in range(3)], 0)

    def tj(a, t):
        x, w = a
        return taps(x + t.astype(bf) * bf(1e-6), w, 1, 200, 384)

    print(f"tj j64 taps576:   {slope(tj, (xj, wfj)):7.3f} ms", flush=True)

    # ---------------- c0: full C2f(128, n=3, shortcut) @ /4
    from mo_yolo_tpu.models.layers import C2f
    mod = C2f(128, 3, True, dtype=bf)
    xc = jnp.asarray(rng.standard_normal((1, 200, 384, 128)), bf)
    vc = mod.init(jax.random.PRNGKey(0), xc)

    def c0(a, t):
        v, x = a
        return mod.apply(v, x + t.astype(bf) * bf(1e-6))

    print(f"c0 C2f(128,n3):   {slope(c0, (vc, xc)):7.3f} ms")


if __name__ == "__main__":
    main()
