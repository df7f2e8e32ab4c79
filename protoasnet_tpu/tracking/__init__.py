from protoasnet_tpu.tracking.trackers import make_tracker, Tracker  # noqa: F401
