"""Flagship train-step wall-clock microbench (device-only, synthetic clip).

Used to record the Pallas-backward vs XLA-backward delta in STATUS
(round-1 VERDICT item #6). Honors MO_YOLO_DEFORM_BWD={pallas,xla}.

Usage: python scripts/bench_train_step.py [--imgsz 320] [--clip 3] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--clip", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 activations (the trainer amp path)")
    ap.add_argument("--impl", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mo_yolo_tpu.models.tracking_model import (build_tracking_model,
                                                   init_variables)
    from mo_yolo_tpu.train.losses import LossConfig
    from mo_yolo_tpu.train.train_step import TrainConfig, make_train_step

    model = build_tracking_model("mo_yolo_tpu/cfg/models/yolo_track.yaml",
                                 nc=1, impl=args.impl,
                                 dtype=jnp.bfloat16 if args.bf16
                                 else jnp.float32)
    v = init_variables(model, jax.random.PRNGKey(0),
                       image_size=(args.imgsz, args.imgsz))
    T, B, G = args.clip, 1, 16
    rng = np.random.default_rng(0)
    clip = {
        "images": jnp.asarray(rng.uniform(0, 1, (T, B, args.imgsz,
                                                 args.imgsz, 3)),
                              jnp.float32),
        "gt_cls": jnp.zeros((T, B, G), jnp.int32),
        "gt_boxes": jnp.asarray(rng.uniform(0.2, 0.8, (T, B, G, 4)),
                                jnp.float32),
        "gt_track_id": jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32),
                                        (T, B, G)),
        "gt_mask": jnp.ones((T, B, G), bool),
    }
    lcfg = LossConfig(nc=1)
    tcfg = TrainConfig(clip_len=T, lr=1e-4, total_steps=1000)
    init_fn, step = make_train_step(model, lcfg, tcfg)
    step = jax.jit(step)
    ts = init_fn(v)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    ts, m = step(ts, clip, key)
    # real host fetch — block_until_ready alone does not synchronize
    # through the axon relay
    float(m["loss"])
    print(f"compile+first step: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(args.iters):
        ts, m = step(ts, clip, key)
    float(m["loss"])
    dt = (time.time() - t0) / args.iters
    print(f"bwd={os.environ.get('MO_YOLO_DEFORM_BWD', 'pallas')} "
          f"impl={model.impl} dtype={model.dtype.__name__} "
          f"steady step: {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
