"""Test configuration: run everything on CPU with 8 virtual devices so that
sharding/multi-chip code paths are exercised without TPU hardware.

Note: the environment's axon sitecustomize force-selects the TPU backend via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so a
plain JAX_PLATFORMS env var is not enough — we must update the config again
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
