"""Tiny-model convergence smoke: loss must drop on a 2-frame synthetic clip.

Also the f32-vs-bf16 AMP quality check (round 4): run with --dtype bf16 to
train the same task with bf16 activations (f32 params/optimizer, the
trainer's `amp=True` semantics) and compare trajectories — the reference
trains AMP (`models/MOTRtrack/train.py:223`).

Usage: python scripts/converge_check.py [--dtype f32|bf16] [--steps N]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from mo_yolo_tpu.models.graph import parse_model_yaml
from mo_yolo_tpu.models.tracker import TrackerConfig, init_track_state
from mo_yolo_tpu.models.tracking_model import TrackingModel
from mo_yolo_tpu.train.losses import LossConfig
from mo_yolo_tpu.train.train_step import TrainConfig, make_train_step

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
ap.add_argument("--steps", type=int, default=60)
args = ap.parse_args()
dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

spec = parse_model_yaml('tests/tiny_track.yaml')
model = TrackingModel(spec=spec, tracker=TrackerConfig(n_slots=8), nq=12,
                      ndl=2, d_ffn=64, hd=32, num_denoising=8, dtype=dtype)
T, B, G, H = 2, 1, 2, 64
# synthetic clip: two moving squares with consistent labels
imgs = np.full((T, B, H, H, 3), 0.3, np.float32)
boxes = np.zeros((T, B, G, 4), np.float32)
for t in range(T):
    for k, (cx, cy) in enumerate([(20 + 4*t, 24), (44, 40 + 3*t)]):
        imgs[t, 0, cy-6:cy+6, cx-6:cx+6, k] = 1.0
        boxes[t, 0, k] = [cx/H, cy/H, 12/H, 12/H]
clip = {
    'images': jnp.asarray(imgs),
    'gt_cls': jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32) % spec.nc, (T, B, G)),
    'gt_boxes': jnp.asarray(boxes),
    'gt_track_id': jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32), (T, B, G)),
    'gt_mask': jnp.ones((T, B, G), bool),
}
key = jax.random.PRNGKey(0)
state = init_track_state(B, 8, 32)
v = model.init(key, clip['images'][0], state, train=False)
tcfg = TrainConfig(clip_len=T, lr=2e-3, warmup_steps=5, total_steps=100,
                   remat=False, drop_prob=0.0, fp_ratio=0.0)
init_fn, step_fn = make_train_step(model, LossConfig(nc=spec.nc), tcfg)
ts = init_fn(v)
step = jax.jit(step_fn, donate_argnums=(0,))
losses = []
t0 = time.time()
for i in range(args.steps):
    key, k = jax.random.split(key)
    ts, m = step(ts, clip, k)
    if i % 10 == 0 or i == args.steps - 1:
        l = float(m['loss']); losses.append(l)
        print(f"step {i}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True)
print(f"[{args.dtype}] first->last:", losses[0], "->", losses[-1],
      "ratio", losses[-1]/losses[0], flush=True)
