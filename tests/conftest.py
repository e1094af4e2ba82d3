"""Test configuration: run everything on CPU with 8 virtual devices so that
sharding/multi-chip code paths are exercised without TPU hardware.

Set ``CLIP_TPU_TEST_TPU=1`` to run the suite against the real TPU backend
instead (hardware validation; sharding tests that need 8 devices will skip
on a single chip).

Note: the environment's axon sitecustomize force-selects the TPU backend via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so a
plain JAX_PLATFORMS env var is not enough — we must update the config again
before any backend is initialized.
"""

import os

USE_TPU = bool(os.environ.get("CLIP_TPU_TEST_TPU"))

if not USE_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_backend():
    if USE_TPU:
        assert jax.default_backend() == "tpu", jax.default_backend()
    else:
        assert jax.default_backend() == "cpu", jax.default_backend()
        assert len(jax.devices()) == 8


def pytest_collection_modifyitems(config, items):
    if USE_TPU and len(jax.devices()) < 8:
        skip = pytest.mark.skip(reason="needs 8 devices; running on real TPU")
        for item in items:
            if "sharding" in item.nodeid or "sharded" in item.nodeid.lower():
                item.add_marker(skip)


ON_TPU = USE_TPU
# bf16 compute on TPU: different batch buckets/tilings produce ULP-scale
# differences vs exact f32 on CPU
TOL = dict(atol=4e-3) if ON_TPU else dict(atol=1e-6)
NORM_ATOL = 4e-3 if ON_TPU else 1e-5


@pytest.fixture
def rng():
    return np.random.default_rng(0)
