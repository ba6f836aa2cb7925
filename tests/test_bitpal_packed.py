import numpy as np
import pytest

from bgsa_tpu import pack
from bgsa_tpu.oracle import align_scores, align_scores_query_in_subject
from bgsa_tpu.ops import bitpal_packed
from bgsa_tpu.schemes import Scoring

SCHEMES = [(2, -3, -5), (1, -1, -1), (3, -1, -2), (0, -2, -3)]


def oracle(queries, subjects, M, I, G):
    return np.stack([align_scores(q, subjects, Scoring(M, I, G)) for q in queries])


@pytest.mark.parametrize("M,I,G", SCHEMES)
def test_packed_xla_global(rng, M, I, G):
    q = rng.integers(0, 4, size=(2, 25)).astype(np.int32)
    s = rng.integers(0, 4, size=(8, 20))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(eq, q, match=M, mismatch=I, gap=G, read_len=20)
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G))


@pytest.mark.parametrize("n", [31, 40, 62, 70])
def test_packed_multi_word(rng, n):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 45)).astype(np.int32)
    s = rng.integers(0, 4, size=(6, n))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(eq, q, match=M, mismatch=I, gap=G, read_len=n)
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G), err_msg=f"n={n}")


def test_packed_semiglobal(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 20)).astype(np.int32)
    s = rng.integers(0, 4, size=(6, 45))
    s[0, 10:30] = q[0]
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(
            eq, q, match=M, mismatch=I, gap=G, read_len=45, semi_global=True
        )
    )
    want = np.stack([align_scores_query_in_subject(qi, s, Scoring(M, I, G)) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_packed_pallas(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 30)).astype(np.int32)
    s = rng.integers(0, 4, size=(256, 40))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed(
            eq, q, match=M, mismatch=I, gap=G, read_len=40, interpret=True
        )
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G))


def test_unsupported_scheme_raises(rng):
    q = np.zeros((1, 5), np.int32)
    eq = pack.pack_eq(np.zeros((1, 5), np.int64), 31)
    with pytest.raises(ValueError, match="packed"):
        bitpal_packed.bitpal_packed_xla(eq, q, match=5, mismatch=-1, gap=-2, read_len=5)
