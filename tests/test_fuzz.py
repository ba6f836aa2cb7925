"""Randomized differential testing: every kernel family vs the NumPy oracle
across random shapes, schemes, and thresholds (the test layer the reference
never had, SURVEY §4). Shapes stay small — this runs on CPU."""

import numpy as np
import pytest

import bgsa_tpu
from bgsa_tpu import oracle
from bgsa_tpu.banded_ref import banded_scores
from bgsa_tpu.schemes import Mode, Scoring


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_myers_both_modes(seed):
    rng = np.random.default_rng(seed + 1000)
    Q = int(rng.integers(1, 4))
    m = int(rng.integers(1, 120))
    S = int(rng.integers(1, 200))
    n = int(rng.integers(1, 120))
    q = rng.integers(0, 5, size=(Q, m))  # incl. N
    s = rng.integers(0, 5, size=(S, n))
    got = bgsa_tpu.align(q, s)
    want = np.stack([-oracle.edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)
    got = bgsa_tpu.align(q, s, mode=Mode.SEMI_GLOBAL)
    want = np.stack([-oracle.edit_distances(qi, s, Mode.SEMI_GLOBAL) for qi in q])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_bitpal_random_schemes(seed):
    rng = np.random.default_rng(seed + 2000)
    M = int(rng.integers(0, 6))
    G = int(rng.integers(-9, -1))
    I = int(rng.integers(2 * G + 1, min(M, 0)))  # M > I > 2G
    if not (M > I > 2 * G):
        pytest.skip("degenerate draw")
    scoring = Scoring(M, I, G)
    Q = int(rng.integers(1, 3))
    m = int(rng.integers(1, 80))
    S = int(rng.integers(1, 150))
    n = int(rng.integers(1, 80))
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    got = bgsa_tpu.align(q, s, scoring=scoring)
    want = np.stack([oracle.align_scores(qi, s, scoring) for qi in q])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_banded_geometries(seed):
    rng = np.random.default_rng(seed + 3000)
    k = int(rng.integers(1, 16))
    m = int(rng.integers(max(2 * k, 8), 200))
    # any geometry with band <= 64: s_len in [m - k, m + (63 - 2k)]
    n = int(rng.integers(m - k, m + (63 - 2 * k) + 1))
    S = int(rng.integers(1, 150))
    q = rng.integers(0, 4, size=(1, m))
    s = rng.integers(0, 4, size=(S, n))
    ncopy = min(S, 5)
    s[:ncopy, : min(m, n)] = q[0][: min(m, n)]  # exercise early-exit mix
    got = bgsa_tpu.align(q[0], s, k=k)
    want = banded_scores(q[0], s, k)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_bitpal_carry_variant(seed):
    """Random supported schemes through the full engine with
    bitpal_carry=True (32-bit compare-carry words) — same oracle scores."""
    from bgsa_tpu.pipeline import PipelineConfig

    rng = np.random.default_rng(seed + 4000)
    G = int(rng.integers(-9, -1))
    I = int(rng.integers(2 * G + 1, 0))
    M = int(rng.integers(0, max(min(6, 2 * I - 2 * G + 1), 1)))
    if not (M > I > 2 * G and M <= 2 * I - 2 * G + 1):
        pytest.skip("degenerate draw")
    scoring = Scoring(M, I, G)
    rngq = np.random.default_rng(seed)
    Q = int(rngq.integers(1, 3))
    m = int(rngq.integers(1, 80))
    S = int(rngq.integers(1, 150))
    n = int(rngq.integers(1, 80))
    q = rngq.integers(0, 4, size=(Q, m))
    s = rngq.integers(0, 4, size=(S, n))
    cfg = PipelineConfig(backend="xla", bitpal_carry=True)
    got = bgsa_tpu.align(q, s, scoring=scoring, config=cfg)
    want = np.stack([oracle.align_scores(qi, s, scoring) for qi in q])
    np.testing.assert_array_equal(got, want)
