"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
exercise a multi-chip mesh without TPU hardware (SURVEY.md §4 plan)."""

import os

# NOTE: this environment's sitecustomize force-registers the axon TPU
# platform and overrides JAX_PLATFORMS — jax.config.update after import is
# the reliable way to pin tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: repeated suite runs skip recompiling the
# heavy train-step/backbone programs (measured ~2-3x faster warm reruns on
# this 1-core host).
# Per-uid path: a fixed world-readable /tmp dir could be owned (or
# poisoned) by another user on a shared host.
# Per-CPU-fingerprint path: XLA:CPU AOT results are NOT keyed by host
# features and this machine pool rotates, so executables cached on one
# host can be loaded on a different one (the loader itself warns "could
# lead to execution errors such as SIGILL"). NOTE the cpu_aot_loader
# "+prefer-no-scatter/gather not supported" stderr noise is NOT that
# case — those are XLA-injected tuning pseudo-features absent from the
# host-feature list even on the compiling machine; same-machine cache
# hits print it too.
import hashlib  # noqa: E402
import tempfile  # noqa: E402


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            info = [ln for ln in f
                    if ln.startswith(("model name", "flags"))][:2]
        return hashlib.sha1("".join(info).encode()).hexdigest()[:10]
    except OSError:
        return "unknown"


jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(tempfile.gettempdir(),
                 f"protoasnet_jax_test_cache_{os.getuid()}_{_cpu_fingerprint()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_csv(tmp_path_factory):
    from protoasnet_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(str(root), num_videos=18, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
