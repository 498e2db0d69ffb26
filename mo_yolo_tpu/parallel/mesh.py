"""Device-mesh parallelism (SPMD over jax.sharding.Mesh).

The reference's entire distributed story is DDP: a subprocess respawn via
`torch.distributed.run` (`utils/dist.py:49-62`), NCCL process groups
(`engine/trainer.py:195-205`), DistributedSampler, and explicit
broadcast/all-reduce calls. The TPU-native equivalent is SPMD: ONE program,
a `Mesh` with a `data` axis, sharding annotations on the batch dimension,
and XLA inserting the gradient all-reduce over ICI automatically — no
process orchestration, no explicit collectives, no stop-flag broadcasts.

Scale-out model (SURVEY.md §2.5): independent video streams shard across
chips on the `data` axis — both for training (clips) and for batched
multi-stream inference. Per-chip work is a whole stream, so there is zero
cross-chip traffic in the inference hot loop; training all-reduces grads
once per clip step.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None, axis: str = DATA_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (axis,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_axis_index: int = 0,
                axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the given axis index across the mesh."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = axis
    return NamedSharding(mesh, P(*spec))


def make_sharded_train_step(model, lcfg, tcfg, mesh: Mesh):
    """jit the clip train step with batch (stream) sharding over `data`.

    Clip arrays are [T, B, ...] — B is sharded, T replicated. Params and
    optimizer state are replicated; XLA emits the grad all-reduce over ICI.
    Returns (init_fn, jitted step_fn).
    """
    from mo_yolo_tpu.train.train_step import make_train_step
    init_fn, step_fn = make_train_step(model, lcfg, tcfg)
    rep = replicate(mesh)
    clip_sh = shard_batch(mesh, batch_axis_index=1)

    jitted = jax.jit(
        step_fn,
        in_shardings=(rep, clip_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    return init_fn, jitted


def make_sharded_stream_step(model, variables, mesh: Mesh):
    """jit the inference stream step with streams sharded over `data`.

    State leaves are [B, ...] and frames [B, H, W, 3]; B is the stream
    axis. One chip per stream group — the per-frame loop never leaves the
    device.
    """
    rep = replicate(mesh)
    b_sh = shard_batch(mesh, batch_axis_index=0)

    def step(vv, state, frames):
        return model.apply(vv, state, frames, method=model.stream_step)

    return jax.jit(step, in_shardings=(rep, b_sh, b_sh),
                   out_shardings=(b_sh, b_sh))
