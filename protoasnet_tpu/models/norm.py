"""Torch-semantics BatchNorm.

flax's ``nn.BatchNorm`` records the BIASED batch variance into the running
average; torch's ``_BatchNorm`` normalizes with the biased variance but
tracks the UNBIASED one (Bessel-corrected, ``n/(n-1)``) in
``running_var``. The reference trains every backbone with torch BN, so
eval-mode forwards after training diverge from torch unless the running
stats follow torch semantics. This module matches torch exactly:

* train: normalize with biased batch var; update running stats as
  ``ra = momentum * ra + (1 - momentum) * stat`` with the unbiased var
  (torch's ``momentum=0.1`` equals our ``momentum=0.9`` convention, the
  same convention flax uses);
* eval: normalize with the running stats.

Stats are computed in float32 regardless of ``dtype`` (flax does the
same); the normalized output is cast back to ``dtype``. Parameter /
variable names ("scale"/"bias", "mean"/"var") match flax's BatchNorm so
checkpoints and the torchvision importers are unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

__all__ = ["BatchNorm"]


class BatchNorm(nn.Module):
    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        stat_dt = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(stat_dt)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axes) - jnp.square(mean), 0.0
            )
            n = 1
            for a in axes:
                n *= x.shape[a]
            bessel = n / (n - 1) if n > 1 else 1.0
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var * bessel)

        y = (x.astype(stat_dt) - mean) * lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)
