import numpy as np

from bgsa_tpu import pack
from bgsa_tpu.oracle import edit_distances
from bgsa_tpu.ops import myers_xla


def run_myers(queries, subjects, factor=-1):
    eq = pack.pack_eq(subjects, 31)
    return np.asarray(
        myers_xla.myers_global(eq, queries.astype(np.int32), read_len=subjects.shape[1], factor=factor)
    )


def test_single_word(rng):
    q = rng.integers(0, 4, size=(2, 20)).astype(np.int32)
    s = rng.integers(0, 4, size=(8, 25))
    got = run_myers(q, s)
    want = np.stack([-edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_multi_word(rng):
    # straddle the 31-bit word boundary and beyond
    for n in (31, 32, 62, 63, 93, 200):
        q = rng.integers(0, 4, size=(2, 50)).astype(np.int32)
        s = rng.integers(0, 4, size=(4, n))
        got = run_myers(q, s)
        want = np.stack([-edit_distances(qi, s) for qi in q])
        np.testing.assert_array_equal(got, want, err_msg=f"n={n}")


def test_factor_positive(rng):
    q = rng.integers(0, 4, size=(1, 30)).astype(np.int32)
    s = rng.integers(0, 4, size=(4, 40))
    np.testing.assert_array_equal(run_myers(q, s, factor=1), -run_myers(q, s, factor=-1))


def test_query_longer_than_subject(rng):
    q = rng.integers(0, 4, size=(1, 100)).astype(np.int32)
    s = rng.integers(0, 4, size=(4, 35))
    got = run_myers(q, s)
    want = -edit_distances(q[0], s)[None]
    np.testing.assert_array_equal(got, want)
