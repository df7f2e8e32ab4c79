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
# Persistent compilation cache: repeated suite runs skip recompiling the
# heavy train-step/backbone programs (measured ~2-3x faster warm reruns on
# this 1-core host). The dir is keyed per-uid AND per-machine
# (hostname+cpuinfo) — see utils/run.py::test_cache_dir for why both
# matter (tmp poisoning; XLA:CPU AOT entries are not portable across the
# rotating machine pool and a migrated "hit" fails feature validation).
# NOTE the cpu_aot_loader "+prefer-no-scatter/gather not supported" stderr
# noise is NOT the cross-machine case — those are XLA-injected tuning
# pseudo-features absent from the host-feature list even on the compiling
# machine; same-machine cache hits print it too.
from protoasnet_tpu.utils.run import enable_test_compilation_cache  # noqa: E402

enable_test_compilation_cache()

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
