import numpy as np

from bgsa_tpu.oracle import align_scores, edit_distances
from bgsa_tpu.schemes import Mode, Scoring


def slow_dp(query, subject, M, I, G, mode="global"):
    """Unvectorized reference DP for the oracle itself."""
    m, n = len(query), len(subject)
    D = np.zeros((n + 1, m + 1), dtype=np.int64)
    for i in range(n + 1):
        D[i, 0] = i * G
    for j in range(m + 1):
        D[0, j] = 0 if mode == "semi" else j * G
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            s = M if subject[i - 1] == query[j - 1] else I
            D[i, j] = max(D[i - 1, j - 1] + s, D[i - 1, j] + G, D[i, j - 1] + G)
    if mode == "semi":
        return D[n, :].max()
    return D[n, m]


def test_matches_slow_dp(rng):
    for _ in range(5):
        m, n = rng.integers(3, 25, size=2)
        q = rng.integers(0, 4, size=m)
        subs = rng.integers(0, 4, size=(3, n))
        for scoring in [Scoring(0, -1, -1), Scoring(2, -3, -5), Scoring(1, -2, -2)]:
            got = align_scores(q, subs, scoring, Mode.GLOBAL)
            want = [slow_dp(q, s, scoring.match, scoring.mismatch, scoring.gap) for s in subs]
            np.testing.assert_array_equal(got, want)
            got = align_scores(q, subs, scoring, Mode.SEMI_GLOBAL)
            want = [
                slow_dp(q, s, scoring.match, scoring.mismatch, scoring.gap, "semi") for s in subs
            ]
            np.testing.assert_array_equal(got, want)


def test_edit_distance_basics():
    # identical -> 0; single substitution -> 1
    q = np.array([0, 1, 2, 3])
    assert edit_distances(q, q[None, :])[0] == 0
    s = q.copy()
    s[1] = 3
    assert edit_distances(q, s[None, :])[0] == 1
    # length difference -> gap cost
    assert edit_distances(q, np.array([[0, 1, 2]]))[0] == 1


def test_semi_global_substring():
    # subject embedded in query aligns free of end gaps
    q = np.array([3, 3, 0, 1, 2, 3, 3, 3])
    s = np.array([[0, 1, 2]])
    assert align_scores(q, s, Scoring(0, -1, -1), Mode.SEMI_GLOBAL)[0] == 0
    assert align_scores(q, s, Scoring(0, -1, -1), Mode.GLOBAL)[0] == -5
