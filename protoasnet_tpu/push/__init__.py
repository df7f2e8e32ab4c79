from protoasnet_tpu.push.push import push_prototypes  # noqa: F401
