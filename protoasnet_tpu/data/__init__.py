from protoasnet_tpu.data.intervals import compute_intervals  # noqa: F401
from protoasnet_tpu.data.manifest import Manifest, CLASS_LABELS  # noqa: F401
from protoasnet_tpu.data.dataset import ASClipDataset, get_as_dataloader  # noqa: F401
