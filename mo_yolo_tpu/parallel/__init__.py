from mo_yolo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, replicate, shard_batch, make_sharded_train_step,
    make_sharded_stream_step,
)
