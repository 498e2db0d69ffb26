"""Per-node backbone/neck timing on the real chip (round 4).

Slope-method timing of growing graph prefixes (`BackboneNeck(..., upto=i)`)
— the difference between prefix i and prefix i-1 is node i's cost. Same
K-chain methodology as `kernel_variants_bench.py`; the prefix trick mirrors
the reference's `BaseModel._profile_one_layer` (`nn/tasks.py:97-120`).

Run ON TPU: python scripts/backbone_layer_bench.py [--imgsz WxH]
"""
import argparse
import time

import jax
import jax.numpy as jnp

from mo_yolo_tpu.models.graph import BackboneNeck, parse_model_yaml


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", default="1536x800")
    ap.add_argument("--yaml", default="mo_yolo_tpu/cfg/models/yolo_track.yaml")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--u8", action="store_true",
                    help="feed RAW uint8 frames (production streaming "
                         "contract: _TapStem consumes u8 directly)")
    ap.add_argument("--from-node", type=int, default=0)
    args = ap.parse_args()
    w, h = (int(v) for v in args.imgsz.split("x"))
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    spec = parse_model_yaml(args.yaml)
    bb = BackboneNeck(spec, dtype=dtype)
    img = jnp.full((1, h, w, 3), 0.5, jnp.float32)
    variables = bb.init(jax.random.PRNGKey(0), img)
    if args.u8:
        img = jnp.full((1, h, w, 3), 128, jnp.uint8)
    n_nodes = len(spec.nodes)
    print(f"{w}x{h} {args.dtype} u8={args.u8}, {n_nodes} nodes")

    prev = 0.0
    for i in range(args.from_node, n_nodes):
        def pre(a, t, i=i):
            v, im = a
            if im.dtype == jnp.uint8:
                # loop-variant u8 input: keep dtype, perturb a corner pixel
                im = im.at[0, 0, 0, 0].set(
                    (t.astype(jnp.int32) % 7).astype(jnp.uint8))
            else:
                im = im + t * 1e-6
            y = bb.apply(v, im, train=False, upto=i)
            if isinstance(y, (list, tuple)):
                y = y[-1]
            return y.sum().astype(jnp.float32)

        ms = slope(pre, (variables, img))
        node = spec.nodes[i]
        print(f"  node {i:2d} {node.module:12s} args={node.args!r:28s} "
              f"rep={node.repeats} cum={ms:7.3f} ms  delta={ms - prev:6.3f} ms",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
