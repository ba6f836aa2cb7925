"""In-memory embedding API (the reference's demo.c surface)."""

import numpy as np
import pytest

import bgsa_tpu
from bgsa_tpu import oracle
from bgsa_tpu.api import encode_sequences
from bgsa_tpu.schemes import Mode, Scoring


def test_reference_demo():
    # The exact example from the reference README's demo.c (README.md:94-165):
    # unit-cost Myers of "AAAA" against four subjects.
    scores = bgsa_tpu.align("AAAA", ["AAAA", "AACA", "CAAC", "AGGG"])
    assert scores.tolist() == [0, -1, -2, -3]


def test_multi_query_matches_oracle():
    rng = np.random.default_rng(7)
    q = rng.integers(0, 4, size=(3, 33))
    s = rng.integers(0, 4, size=(5, 40))
    got = bgsa_tpu.align(q, s)
    want = np.stack([-oracle.edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_bitpal_scoring_and_semiglobal():
    rng = np.random.default_rng(8)
    q = rng.integers(0, 4, size=(2, 20))
    s = rng.integers(0, 4, size=(3, 24))
    scoring = Scoring(2, -3, -5)
    got = bgsa_tpu.align(q, s, scoring=scoring)
    want = np.stack([oracle.align_scores(qi, s, scoring) for qi in q])
    np.testing.assert_array_equal(got, want)
    # BitPAl semi-global frees the subject ends (query-in-subject semantics).
    got = bgsa_tpu.align(q, s, scoring=scoring, mode=Mode.SEMI_GLOBAL)
    want = np.stack([oracle.align_scores_query_in_subject(qi, s, scoring) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_banded_threshold():
    q = "ACGTACGTACGTACGTACGTACGTACGTACGT"
    subjects = [q, q[:-1] + "A", "A" * 32]
    scores = bgsa_tpu.align(q, subjects, k=3)
    assert scores[0] == 0
    assert scores[1] == 1
    assert scores[2] == 127  # exceeds threshold -> MAX_ERROR sentinel


def test_encode_validation():
    with pytest.raises(ValueError, match="same length"):
        bgsa_tpu.align("AAAA", ["AA", "AAA"])
    with pytest.raises(ValueError, match="0..4"):
        encode_sequences(np.array([[9]]), name="x")


def test_align_with_local_shards(rng):
    """Embedding API pads to v_num x n_shards (regression: crashed whenever
    local_shards > 1 because each device's slice lost lane alignment)."""
    import jax

    from bgsa_tpu.pipeline import PipelineConfig

    if len(jax.devices()) < 2:
        return
    q = rng.integers(0, 4, size=(2, 25))
    s = rng.integers(0, 4, size=(100, 30))
    got = bgsa_tpu.align(q, s, config=PipelineConfig(backend="xla", local_shards=2))
    want = np.stack([-oracle.edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_string_array_queries_are_multi():
    # regression: a 1-D numpy array of strings must not be treated as one query
    got = bgsa_tpu.align(np.array(["AAAA", "CCCC"]), ["AAAA", "CCCC", "GGGG"])
    assert got.shape == (2, 3)
    assert got[0].tolist() == [0, -4, -4]
    assert got[1].tolist() == [-4, 0, -4]


def test_encode_edges():
    """Empty input errors by name; lane-aligned batches skip the pad copy."""
    import numpy as np
    import pytest

    from bgsa_tpu import api

    with pytest.raises(ValueError, match="subjects: empty"):
        api.encode_sequences([], name="subjects")
    codes = np.zeros((256, 8), np.int32)
    padded, real = api._pad_lanes(codes, 128)
    assert padded is codes and real == 256
