from protoasnet_tpu.parallel.mesh import (  # noqa: F401
    distributed_requested,
    make_mesh,
    maybe_initialize_distributed,
    shard_batch,
    replicate,
    batch_sharding,
)
