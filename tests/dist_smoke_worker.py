"""Worker for the 2-process `jax.distributed` localhost smoke test.

Launched twice (rank 0/1) by tests/test_train_step.py::
test_distributed_two_process_smoke with torchrun-style env vars — the
bootstrap path `parallel/distributed.py:initialize` + `_env_spec` must
bring up the coordinator, see both processes, build a global mesh, and
run a REAL cross-process collective (sharded sum over the data axis).
"""

import sys

import numpy as np


def main() -> None:
    sys.path.insert(0, sys.argv[2])
    from mo_yolo_tpu.parallel import distributed as D

    rank = int(sys.argv[1])
    ok = D.initialize()
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert ok, "initialize() returned False under WORLD_SIZE=2"
    assert jax.process_count() == 2, jax.process_count()
    mesh = D.global_mesh()
    n = mesh.devices.size
    n_local = jax.local_device_count()
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((n_local,), float(rank + 1), np.float32), (n,))
    total = jax.jit(lambda a: jax.numpy.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(x)
    expect = n_local * (1.0 + 2.0)
    assert float(total) == expect, (float(total), expect)
    print(f"rank {rank}: processes=2 global_devices={n} sum={float(total)}")


if __name__ == "__main__":
    main()
