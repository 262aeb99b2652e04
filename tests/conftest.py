"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices. The container's
sitecustomize registers a TPU PJRT plugin at interpreter start, which
both selects the TPU platform and breaks
``xla_force_host_platform_device_count``; the only reliable fix is to
re-exec the test process with a sanitized environment before any jax
import took effect.
"""
import os
import sys

_SENTINEL = "MASKPLANNER_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_SENTINEL):
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return "axon_site" in pythonpath or os.environ.get("JAX_PLATFORMS") not in (
        None, "cpu")


if _needs_reexec():
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]],
               env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
