"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
XLA's host-platform device virtualization, and numeric tests run on CPU
for determinism.  Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box exposes one
# TPU chip through a slow tunnel; numeric tests want the deterministic
# multi-device CPU backend).  Set SIGDIGGER_TEST_TPU=1 to run on TPU.
if not os.environ.get("SIGDIGGER_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin (jaxtyping) imports jax before this conftest runs, and
# jax snapshots JAX_PLATFORMS at import — override via the config API,
# which works as long as no backend has been initialized yet.
if not os.environ.get("SIGDIGGER_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
