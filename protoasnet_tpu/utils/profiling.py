"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1 — only wall-clock epoch timing).
Here profiling is first-class:

* ``StepTimer`` — per-epoch breakdown of data-wait vs step-dispatch vs
  host-metric time, logged at epoch end (negligible overhead, always on).
* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace for the wrapped region (enable with
  PROTOASNET_PROFILE_DIR or config ``profile_dir``).
* ``annotate`` — ``jax.profiler.TraceAnnotation`` passthrough for naming
  custom regions inside a trace.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

__all__ = ["StepTimer", "trace", "annotate"]


class StepTimer:
    """Accumulates wall-clock per phase: use as
    ``with timer.phase("data"): ...`` and read ``timer.summary()``."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def log(self, prefix: str = "") -> None:
        if not self.totals:
            return
        total = sum(self.totals.values())
        parts = " | ".join(
            f"{k}: {v:.2f}s ({v / max(total, 1e-9):.0%}, "
            f"{v / max(self.counts[k], 1) * 1000:.1f} ms/it)"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        )
        logging.info(f"{prefix}step-time breakdown: {parts}")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace for the wrapped region; no-op when log_dir falsy."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
        logging.info(f"jax profiler trace -> {log_dir}")
    except Exception:
        logging.exception("failed to start jax profiler trace")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                logging.exception("failed to stop jax profiler trace")


def annotate(name: str):
    """Named region inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
