from protoasnet_tpu.losses.losses import (  # noqa: F401
    ce_loss,
    ce_loss_abstain,
    cluster_patch,
    cluster_roi,
    l_norm,
    l_norm_fc,
    l_norm_occurrence,
    mse_loss,
    orthogonality_loss,
    separation_patch,
    separation_roi,
    transform_loss,
    sample_affine_params,
)
from protoasnet_tpu.losses.bundle import LossBundle  # noqa: F401
