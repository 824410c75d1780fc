"""Test configuration: run everything on a simulated 8-device CPU mesh.

SURVEY §4 implication (e): multi-device tests use XLA's host-platform device
virtualization — the TPU-world replacement for fake-NCCL-backend testing.
Must be set before JAX initializes, hence the env mutation at import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize (PYTHONPATH) re-selects "axon,cpu" after import;
# force CPU before any backend initializes so tests run on the virtual
# 8-device host platform even when a real TPU is attached.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
