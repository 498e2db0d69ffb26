"""Multi-host (multi-slice / multi-process) initialization.

The reference's DDP bootstrap is a subprocess respawn via
`torch.distributed.run` plus NCCL process groups (`utils/dist.py:49-62`,
`engine/trainer.py:195-205`, `MOTR/util/misc.py:442`). The TPU-native
equivalent is `jax.distributed.initialize()`: every host runs the SAME
SPMD program; `jax.devices()` then spans all hosts and the data-parallel
mesh in `parallel.mesh` shards streams/clips globally with gradient
all-reduce over ICI (intra-slice) / DCN (cross-slice) — no process
respawn, no explicit collectives, no stop-flag broadcasts.

On Cloud TPU pods the coordinator/process env is auto-detected; on other
fabrics pass coordinator_address/num_processes/process_id explicitly or
via the standard env vars read by `init_from_env`.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent `jax.distributed.initialize`. Returns True when running
    multi-process after the call, False for single-process runs (a no-op —
    the same training script works unchanged on one host)."""
    import jax

    if num_processes is None and coordinator_address is None and \
            _env_spec() is None and not _on_tpu_pod():
        return False  # single host, nothing to do
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        else:
            spec = _env_spec()
            if spec is not None:
                jax.distributed.initialize(*spec)
            else:
                jax.distributed.initialize()  # TPU-pod auto-detection
    except RuntimeError as e:
        # "already initialized" -> idempotent no-op. "must be called before
        # any JAX calls" -> the backend is already up in this process; on a
        # genuinely multi-process fabric that is a launcher bug, but when
        # auto-detection merely *suspected* a pod (TPU env vars present on a
        # single-host setup) it means single-process — report what we are.
        msg = str(e)
        if "already initialized" not in msg and \
                "before any JAX calls" not in msg:
            raise
    except ValueError:
        # auto-detection found no coordinator: single-process run
        return False
    return jax.process_count() > 1


def _env_spec():
    """torchrun-style env bootstrap (MASTER_ADDR/PORT, WORLD_SIZE, RANK) —
    the variables the reference's DDP launcher sets (`utils/dist.py`), so
    existing launch tooling carries over."""
    addr = os.environ.get("MASTER_ADDR")
    world = os.environ.get("WORLD_SIZE")
    rank = os.environ.get("RANK")
    if addr and world and rank and int(world) > 1:
        port = os.environ.get("MASTER_PORT", "1234")
        return f"{addr}:{port}", int(world), int(rank)
    return None


def _on_tpu_pod() -> bool:
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES") or
                os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def global_mesh(axis: str = "data"):
    """Data-parallel mesh over ALL processes' devices (call after
    `initialize()`); per-host data feeding should use
    `jax.make_array_from_process_local_data` with this mesh's sharding."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def shard_host_batch(mesh, batch, batch_axis_index: int = 0):
    """Assemble a GLOBAL batch from per-process local data: each host
    feeds its shard; jax glues them into one global array (the SPMD
    replacement for the reference's DistributedSampler)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(*spec))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
