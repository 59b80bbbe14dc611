from ttscube_tpu.parallel.mesh import (
    make_mesh,
    partition_params,
    shard_batch,
    make_parallel_train_step,
)

__all__ = ["make_mesh", "partition_params", "shard_batch", "make_parallel_train_step"]
