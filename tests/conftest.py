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

# Persistent compilation cache: the heavy XLA-scan compiles (BitPAl golden)
# only cost their first run on a machine; ~halves repeat suite wall time.
_cache_dir = os.environ.get("BGSA_TEST_JAX_CACHE", "/tmp/bgsa_test_jax_cache")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0.1 s: the suite's many small XLA CPU steps (0.1-1 s compiles) are
    # exactly the band that re-pays every run without the cache; a cache
    # read costs ~10-30 ms against that.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
except Exception:
    pass  # cache is best-effort

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_codes(rng, shape, nchars=4):
    """Random symbol codes (ACGT by default)."""
    return rng.integers(0, nchars, size=shape).astype(np.int32)
