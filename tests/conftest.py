"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The ambient environment pins JAX_PLATFORMS=axon (one real TPU chip via the
axon plugin, registered by a sitecustomize hook at interpreter startup), so
setting the env var here is not enough — we must override the config before
any computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_codes(rng, shape, nchars=4):
    """Random symbol codes (ACGT by default)."""
    return rng.integers(0, nchars, size=shape).astype(np.int32)
