"""Test configuration.

Tests run on CPU (forced before any jax backend initialization). Note:
this container's sitecustomize registers a TPU PJRT plugin at interpreter
start, which breaks ``xla_force_host_platform_device_count`` in-process —
so multi-device sharding tests run through ``run_in_clean_subprocess``
(sanitized env, N virtual CPU devices) instead of an in-process mesh;
``__graft_entry__.dryrun_multichip`` uses the same fallback.
"""
import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

# The container's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (real TPU via tunnel); the env var above is read too
# late, so force the platform through the config (backends are registered
# but not yet initialized at conftest time).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_in_clean_subprocess(code: str, n_devices: int = 8,
                            timeout: int = 560) -> str:
    """Run a python snippet with N virtual CPU devices in a sanitized env."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        [REPO_ROOT] + [p for p in env.get("PYTHONPATH", "").split(":")
                       if p and "axon_site" not in p])
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}").strip()
    env.pop("MASKPLANNER_TPU_TEST_REEXEC", None)
    result = subprocess.run([sys.executable, "-c", code], env=env,
                            capture_output=True, text=True, timeout=timeout,
                            cwd=REPO_ROOT)
    assert result.returncode == 0, (
        f"subprocess failed:\nstdout:\n{result.stdout}\nstderr:\n{result.stderr}")
    return result.stdout


@pytest.fixture
def clean_subprocess():
    return run_in_clean_subprocess


@pytest.fixture
def rng():
    return np.random.default_rng(0)
