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

# Multi-second integration tests (subprocess roles pay a ~3 s jax-import
# floor each on this 1-core box; the differential module drives compiled
# reference binaries). Default `pytest tests/` runs everything; the quick
# dev tier is `pytest tests/ -m "not slow"` (~2 min warm).
_SLOW_TESTS = {
    "test_host_auto_from_jax_distributed",
    "test_dynamic_rebalances_and_merges_byte_equal",
    "test_host_auto_concurrent_roles",
    "test_dynamic_with_fasta_inputs",
    "test_hetero_dynamic_rebalances",
    "test_hetero_banded_and_cli",
    "test_hetero_static_matches_single",
    "test_resume_from_any_truncation_point",
    "test_resume_after_sigkill",
    "test_sample_data_matches_reference_golden",
    "test_banded_multihost_roles_merge_equals_single",
    "test_multihost_roles_merge_equals_single",
    "test_shard_resume_after_interruption",
    "test_merge_infers_dtype_from_sidecar",
    "test_cli_host_roles_and_merge",
    "test_pipeline_rare_n_uses_sidecar",
    "test_cli_accepts_fastx_inputs",
    "test_cli_profile_flag",
    "test_hetero_sparse_n_sidecar_and_uneven_tail",
    "test_dynamic_resume_republishes_lost_time_file",
    "test_pallas_semiglobal_interpret",
}
_SLOW_MODULES = {"test_reference_diff"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.name.split("[")[0] in _SLOW_TESTS
                or item.module.__name__ in _SLOW_MODULES):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_codes(rng, shape, nchars=4):
    """Random symbol codes (ACGT by default)."""
    return rng.integers(0, nchars, size=shape).astype(np.int32)
