from clsr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, state_sharding, make_sharded_train_step,
    shard_batch,
)
