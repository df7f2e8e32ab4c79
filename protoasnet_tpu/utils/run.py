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
           "enable_compilation_cache", "test_cache_dir",
           "enable_test_compilation_cache"]


def test_cache_dir(tag: str = "test") -> str:
    """Per-uid, per-MACHINE persistent XLA cache dir for test/driver runs.

    The single source of truth for every CPU test-cache path in this repo
    (conftest, the float64 trajectory drivers) — no module should define
    its own. Two hard-won constraints shape the key:

    - per-uid (not a fixed /tmp name): a predictable world-writable path
      could be pre-created/poisoned by another local user, and JAX
      deserializes compiled executables from this dir.
    - per-machine via hostname + cpuinfo hash: XLA:CPU AOT executables
      are NOT keyed by host target features, and this machine pool
      rotates. Round 4's cpuinfo-only fingerprint (model name + flags)
      collided across hosts whose actual XLA target features differ,
      poisoning the driver dryrun (MULTICHIP_r04 rc=124, cpu_aot_loader
      "could lead to ... SIGILL"). Hostname makes entries physically
      unable to migrate between pool machines; cpuinfo stays in the key
      as belt-and-braces for hostname-reuse-after-reimage.

    The cache's value is warm REruns on the SAME machine (measured 2-3x
    faster suite reruns) — cross-machine reuse is exactly what must not
    happen.
    """
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"protoasnet_jax_{tag}_cache_{os.getuid()}_{_machine_key()}")


def _machine_key() -> str:
    """Hostname + cpuinfo fingerprint — entries keyed by it cannot migrate
    between pool machines (see :func:`test_cache_dir` rationale)."""
    import hashlib
    import socket

    try:
        with open("/proc/cpuinfo") as f:
            info = "".join(ln for ln in f
                           if ln.startswith(("model name", "flags")))
    except OSError:
        info = "unknown"
    return hashlib.sha1(
        (socket.gethostname() + "\x00" + info).encode()).hexdigest()[:12]


def enable_test_compilation_cache(tag: str = "test",
                                  min_compile_time_secs: float = 1.0) -> str:
    """Point JAX's persistent compile cache at :func:`test_cache_dir`.

    For CPU test processes only (conftest, trajectory subprocess drivers).
    Production entry points use :func:`enable_compilation_cache` (~/.cache);
    the driver contract ``__graft_entry__.py`` deliberately uses NO cache
    (see the rationale at its top).
    """
    import jax

    path = test_cache_dir(tag)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return path


def enable_compilation_cache(cache_dir: Optional[str] = None,
                             min_compile_time_secs: float = 1.0,
                             max_size_bytes: int = 8 << 30) -> Optional[str]:
    """Turn on JAX's persistent XLA compilation cache for this process.

    JAX ships this off by default, so every ``main.py`` / serving-daemon
    start pays the full XLA compile of every jitted program. Measured on
    this host (2026-08-19, 6-conv probe through the TPU relay): cold
    compile 181.7 s vs 70.6 s / 10.8 s warm-from-cache across two sessions
    — a 2.6–17x startup win, biggest exactly where it matters (restarting
    a trained run, redeploying the daemon). The reference has no
    equivalent (torch eager compiles nothing).

    Resolution order: explicit arg > ``PROTOASNET_COMPILE_CACHE_DIR`` env >
    ``~/.cache/protoasnet_tpu/xla/<platform>`` (the default is scoped per
    JAX platform, and the CPU scope is additionally machine-keyed — see
    the inline rationale). Set ``PROTOASNET_NO_COMPILE_CACHE=1``
    to opt out (returns None). Safe to call more than once; call before
    the first jit compile for full effect (later calls still help later
    compiles). Returns the cache dir in use.

    Growth/retention: with const-weight serving (SERVING.md) every distinct
    checkpoint's HLO embeds the full model weights, so each redeploy adds a
    model-sized entry — unbounded over many redeploys, and a plaintext copy
    of the weights at rest (treat the cache dir with checkpoint-level
    permissions, or point it at the run dir). ``max_size_bytes`` caps the
    dir with JAX's LRU eviction (default 8 GiB ≈ hundreds of flagship
    entries); set ``PROTOASNET_COMPILE_CACHE_MAX_BYTES`` to override, or
    0 to disable eviction.
    """
    if os.environ.get("PROTOASNET_NO_COMPILE_CACHE"):
        return None
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("PROTOASNET_COMPILE_CACHE_DIR")
    if cache_dir is None:
        # Default dir: scope by platform, and machine-key the CPU scope.
        # ~/.cache migrates with $HOME across this rotating machine pool;
        # TPU/GPU executables don't depend on host-CPU target features, so
        # sharing them across hosts is safe AND is where the measured
        # warm-start win lives (same chip behind the relay every day).
        # XLA:CPU AOT entries are NOT keyed by host features (the
        # MULTICHIP_r04 poisoning, test_cache_dir rationale): a CPU run on
        # a rotated host pays a failed-validation load attempt per entry
        # (cpu_aot_loader "could lead to ... SIGILL" noise, observed from
        # the serving daemon on 2026-08-20) — so CPU entries get a
        # per-machine subdir instead.
        platform = jax.default_backend()
        sub = f"cpu-{_machine_key()}" if platform == "cpu" else platform
        cache_dir = os.path.join(os.path.expanduser("~"), ".cache",
                                 "protoasnet_tpu", "xla", sub)
    makedir(cache_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only skip truly trivial programs; the relay makes even small
    # compiles expensive, so the default 1.0 s floor is already generous.
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    max_size = int(os.environ.get("PROTOASNET_COMPILE_CACHE_MAX_BYTES",
                                  max_size_bytes))
    if max_size > 0:
        jax.config.update("jax_compilation_cache_max_size", max_size)
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
