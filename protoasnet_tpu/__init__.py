"""ProtoASNet-TPU: a TPU-native (JAX/XLA/Pallas) framework for prototype-based,
inherently interpretable, uncertainty-aware echocardiography classification.

This is a ground-up re-design of the capabilities of hooman007/ProtoASNet
(MICCAI 2023) for TPU hardware:

* functional models (flax.linen) instead of mutable ``nn.Module`` state,
* a single jitted train/eval step with explicit PRNG keys,
* device-mesh data parallelism via ``jax.sharding`` (no CUDA_VISIBLE_DEVICES),
* the prototype-push projection as an on-device batched argmin scan,
* fused input transforms (resize / normalize / affine augment) as XLA ops,
* an optional Pallas kernel for the occurrence-weighted ROI pooling +
  cosine-similarity prototype head.

Public surface mirrors the reference (``main.py`` / ``explain.py`` parity):
config-driven train / eval / push / explain entry points with equivalent
checkpoint and ``prototypes_info.pickle`` outputs.
"""

__version__ = "0.1.0"

from protoasnet_tpu.utils.config import load_config, updated_config  # noqa: F401
