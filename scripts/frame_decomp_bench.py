"""Slope-method frame decomposition on the real chip (round 4).

Times, inside ONE compiled lax.scan with loop-variant inputs and K-chain
slope correction (see kernel_variants_bench.py), the flagship model's:
  - full stream_step
  - backbone+neck only
  - full step with the XLA deform-attn oracle (isolates the kernel share)

Run ON TPU: python scripts/frame_decomp_bench.py [--imgsz WxH]
"""
import argparse
import time

import jax
import jax.numpy as jnp

from mo_yolo_tpu.models.tracker import init_track_state
from mo_yolo_tpu.models.tracking_model import (build_tracking_model,
                                               init_variables)


def timed_chain(fn, args, chain, iters=20):
    """fn(args, i, k) -> scalar f32; returns ms/iter."""
    @jax.jit
    def run(*args):
        def body(c, i):
            acc = jnp.float32(0.0)
            for k in range(chain):
                acc = acc + fn(args, i + acc * 1e-30, k)
            return c + acc, None
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    v = float(run(*args))
    assert v == v
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(*args))
        times.append((time.perf_counter() - t0) / iters * 1e3)
    return times[-1]


def slope(fn, args, iters=20):
    t1 = timed_chain(fn, args, 1, iters)
    t3 = timed_chain(fn, args, 3, iters)
    return (t3 - t1) / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", default="1536x800")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    w, h = (int(v) for v in args.imgsz.split("x"))
    print(f"backend={jax.default_backend()} {w}x{h}")

    for impl in ("pallas", "onehot", "xla"):
        model = build_tracking_model(
            "mo_yolo_tpu/cfg/models/yolo_track.yaml", impl=impl,
            dtype=jnp.bfloat16)
        variables = init_variables(model, jax.random.PRNGKey(0),
                                   image_size=(h, w), batch=1)
        state = init_track_state(1, model.tracker.n_slots, model.hd)
        img = jnp.full((1, h, w, 3), 0.5, jnp.float32)

        def full(a, i, k, model=model):
            v, s, im = a
            im = im + i * 1e-6
            s2, out = model.apply(v, s, im, method=model.stream_step)
            return out[..., 4].sum().astype(jnp.float32)

        ms_full = slope(full, (variables, state, img), args.iters)
        print(f"  stream_step[{impl}]: {ms_full:.2f} ms/frame")

        if impl == "pallas":
            def bb(a, i, k, model=model):
                v, s, im = a
                im = im + i * 1e-6
                feats = model.apply(v, im, train=False,
                                    method=lambda m, x, train: m.backbone(
                                        x, train=train))
                return sum(f.sum() for f in feats).astype(jnp.float32)

            ms_bb = slope(bb, (variables, state, img), args.iters)
            print(f"  backbone+neck: {ms_bb:.2f} ms/frame")


if __name__ == "__main__":
    main()
