"""On-device epoch metric accumulation.

SURVEY.md §5.8 design point: the reference computes sklearn metrics on the
host EVERY batch (a device sync per step — on this environment's relayed
TPU, the sync costs more than the train step itself). Here per-batch
outputs (logits, similarities, targets, valid, loss terms) accumulate into
preallocated DEVICE buffers via a jitted scatter; the host reads everything
back ONCE at epoch end and feeds the standard EpochMetrics.

Default ON since round 5 (measured 1.43x for an eval epoch at batch 128
through the relay, 489 -> 701 clips/s, experiments/device_metrics_ab.py);
``train.on_device_metrics: false`` restores the reference's per-batch
host logging behavior (val_push/test always use the host path — the
pred-log CSVs need per-sample metadata).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["DeviceEpochBuffer"]


@partial(jax.jit, donate_argnums=(0,))
def _scatter(bufs, step, logits, sims, target, valid, loss_vec):
    b = logits.shape[0]
    start = step * b
    return {
        "logits": jax.lax.dynamic_update_slice(
            bufs["logits"], logits.astype(jnp.float32), (start, 0)),
        "sims": jax.lax.dynamic_update_slice(
            bufs["sims"], sims.astype(jnp.float32), (start, 0)),
        "target": jax.lax.dynamic_update_slice(
            bufs["target"], target.astype(jnp.int32), (start,)),
        "valid": jax.lax.dynamic_update_slice(
            bufs["valid"], valid, (start,)),
        "loss_sums": bufs["loss_sums"] + loss_vec,
        "n_batches": bufs["n_batches"] + 1,
    }


class DeviceEpochBuffer:
    """Preallocated device buffers for one epoch's outputs."""

    def __init__(self, n_batches: int, batch_size: int, num_logits: int,
                 num_prototypes: int, loss_names):
        n = n_batches * batch_size
        self.loss_names = list(loss_names)
        self.bufs = {
            "logits": jnp.zeros((n, num_logits), jnp.float32),
            "sims": jnp.zeros((n, num_prototypes), jnp.float32),
            "target": jnp.zeros((n,), jnp.int32),
            "valid": jnp.zeros((n,), jnp.bool_),
            "loss_sums": jnp.zeros((len(self.loss_names),), jnp.float32),
            "n_batches": jnp.zeros((), jnp.int32),
        }
        self._step = 0

    def update(self, metrics: Dict[str, Any], target, valid) -> None:
        """Queue this step's outputs into the device buffers (async)."""
        loss_vec = jnp.stack([metrics[k] for k in self.loss_names])
        self.bufs = _scatter(self.bufs, self._step, metrics["logits"],
                             metrics["similarities"], target, valid, loss_vec)
        self._step += 1

    def finalize(self, epoch_metrics) -> Dict[str, float]:
        """ONE device->host transfer; feeds the standard EpochMetrics."""
        host = jax.device_get(self.bufs)
        n_b = max(int(host["n_batches"]), 1)
        # per-batch means; EpochMetrics sees ONE mega-batch (n_batches=1),
        # so its compute() returns these unchanged
        loss_terms = {k: float(v) / n_b
                      for k, v in zip(self.loss_names, host["loss_sums"])}
        epoch_metrics.update(
            host["logits"], host["target"], host["valid"],
            similarities=host["sims"], loss_terms=loss_terms,
        )
        return loss_terms
