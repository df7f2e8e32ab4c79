"""Run-directory management, logging, seeding, code backup.

Capability parity with the reference experiment utilities
(/root/reference/src/utils/utils.py:134-222): run-dir auto-increment,
file+stdout logging, deterministic seeding, per-run config dump and
source-code backup.

JAX note: there is no global RNG — ``set_seed`` seeds python/numpy (for the
host-side data pipeline) and returns a ``jax.random.PRNGKey`` which the
caller threads through all device-side randomness explicitly.
"""

from __future__ import annotations

import logging
import os
import random
import shutil
import sys
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["set_seed", "set_logger", "create_save_loc", "backup_code", "makedir",
           "enable_compilation_cache"]


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0) -> Optional[str]:
    """Turn on JAX's persistent XLA compilation cache for this process.

    JAX ships this off by default, so every ``main.py`` / serving-daemon
    start pays the full XLA compile of every jitted program. Measured on
    this host (2026-08-19, 6-conv probe through the TPU relay): cold
    compile 181.7 s vs 70.6 s / 10.8 s warm-from-cache across two sessions
    — a 2.6–17x startup win, biggest exactly where it matters (restarting
    a trained run, redeploying the daemon). The reference has no
    equivalent (torch eager compiles nothing).

    Resolution order: explicit arg > ``PROTOASNET_COMPILE_CACHE_DIR`` env >
    ``~/.cache/protoasnet_tpu/xla``. Set ``PROTOASNET_NO_COMPILE_CACHE=1``
    to opt out (returns None). Safe to call more than once; call before
    the first jit compile for full effect (later calls still help later
    compiles). Returns the cache dir in use.
    """
    if os.environ.get("PROTOASNET_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "PROTOASNET_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "protoasnet_tpu", "xla"))
    makedir(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only skip truly trivial programs; the relay makes even small
    # compiles expensive, so the default 1.0 s floor is already generous.
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def makedir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def set_seed(seed: int):
    """Seed host RNGs and return the root jax PRNG key."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def set_logger(save_dir: str, log_level: str = "info", run_type: str = "train",
               comment: str = "") -> None:
    """File + stdout logging, one level-named logfile per entry-point type."""
    level = getattr(logging, log_level.upper(), logging.INFO)
    makedir(save_dir)
    log_path = os.path.join(save_dir, f"{log_level}_{run_type}{comment}.log")
    root = logging.getLogger()
    root.setLevel(level)
    # avoid duplicate handlers when called twice in one process (tests)
    root.handlers = [h for h in root.handlers
                     if not isinstance(h, (logging.FileHandler, logging.StreamHandler))]
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    fh = logging.FileHandler(log_path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(sh)


def create_save_loc(config: Dict[str, Any]) -> None:
    """Resolve config['save_dir'] to a unique run directory.

    If the directory already exists *without* a checkpoint in it, a numeric
    suffix is appended (parity with reference create_save_loc,
    utils.py:146-182). If it contains a checkpoint, it is reused so training
    can resume.
    """
    base = os.path.join(config["save_dir"], config["run_name"])
    save_dir = base
    idx = 1
    while os.path.exists(save_dir):
        has_ckpt = any(
            f.endswith((".ckpt", ".pth", ".msgpack"))
            for f in os.listdir(save_dir)
            if os.path.isfile(os.path.join(save_dir, f))
        )
        if has_ckpt:
            break
        save_dir = f"{base}_{idx}"
        idx += 1
    makedir(save_dir)
    config["save_dir"] = save_dir


def backup_code(save_dir: str, src_root: Optional[str] = None) -> None:
    """Copy the framework source into {save_dir}/code for reproducibility."""
    if src_root is None:
        src_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = os.path.join(save_dir, "code", os.path.basename(src_root))
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(
        src_root, dst,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so", "*.o"),
    )
