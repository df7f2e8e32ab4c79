"""Multi-step training TRAJECTORY parity vs torch.

The strongest machine-checkable substitute for real-dataset AUROC parity
(the reference's experiment dataset is private): N Adam steps -> push ->
prototype replacement -> post-push step, side by side with a torch twin
following the reference semantics exactly, parameters compared at every
boundary at float64 near-machine precision (rtol 1e-7).

The actual run lives in tests/trajectory_driver.py and executes in a
subprocess because JAX x64 mode is process-global; float64 is required
because Adam's first step is ~lr * sign(grad), which amplifies fp32
rounding noise on near-zero gradients into full ±lr parameter divergence
regardless of framework correctness.
"""

import os
import subprocess
import sys

import pytest

# multi-minute e2e subprocess run — slow-marked per project convention
# (the fast loop is `-m "not slow"`; the full suite always runs this)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver(name: str, token: str) -> None:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device mesh needed
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", name)],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900,
    )
    assert r.returncode == 0, f"driver failed:\n{r.stdout}\n{r.stderr}"
    assert token in r.stdout, r.stdout


def test_train_push_replace_train_trajectory_matches_torch():
    _run_driver("trajectory_driver.py", "TRAJECTORY_OK")


def test_staged_three_optimizer_trajectory_matches_torch():
    """warm -> joint -> push -> 5x last-only -> joint resume with three
    separate Adam states (VERDICT round-2 item 4a)."""
    _run_driver("trajectory_staged_driver.py", "STAGED_TRAJECTORY_OK")


def test_protopnet_patch_push_trajectory_matches_torch():
    """ProtoPNet L2-patch head + staged schedule + patch push
    (VERDICT round-2 item 4b)."""
    _run_driver("trajectory_protopnet_driver.py", "PROTOPNET_TRAJECTORY_OK")
