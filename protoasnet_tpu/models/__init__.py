from protoasnet_tpu.models.builder import build_model  # noqa: F401
