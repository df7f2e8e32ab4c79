from protoasnet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    maybe_initialize_distributed,
    shard_batch,
    replicate,
    batch_sharding,
)
