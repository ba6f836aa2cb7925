import numpy as np
import pytest

from bgsa_tpu import banded_ref, pack
from bgsa_tpu.ops import banded as banded_ops


def make_case(rng, Q, m, S, n, k):
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(S, n))
    # half near-matches so a mix of real scores and 127s is produced
    for i in range(S // 2):
        t = np.zeros(n, np.int64)
        t[: min(m, n)] = q[i % Q][: min(m, n)]
        if n > m:
            t[m:] = rng.integers(0, 4, n - m)
        for _ in range(rng.integers(0, k + 5)):
            t[rng.integers(0, n)] = rng.integers(0, 4)
        s[i] = t
    return q, s


@pytest.mark.parametrize("m,n,k", [(100, 100, 4), (150, 150, 8), (40, 50, 12), (150, 155, 20)])
def test_xla_matches_bitport(rng, m, n, k):
    q, s = make_case(rng, 2, m, 16, n, k)
    lo, hi, inj = pack.pack_banded(s, k, m)
    got = np.asarray(banded_ops.banded_xla(lo, hi, inj, q, q_len=m, s_len=n, k=k))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_wide_band_hi_word(rng):
    # band_down >= 32: injection lands in the hi word
    m, n, k = 80, 100, 20  # band = 2*20 + 20 + 1 = 61 bits
    q, s = make_case(rng, 2, m, 8, n, k)
    lo, hi, inj = pack.pack_banded(s, k, m)
    got = np.asarray(banded_ops.banded_xla(lo, hi, inj, q, q_len=m, s_len=n, k=k))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_pallas_matches_bitport(rng):
    m, n, k = 150, 150, 8
    q, s = make_case(rng, 2, m, 256, n, k)
    lo, hi, inj = pack.pack_banded(s, k, m)
    got = np.asarray(
        banded_ops.banded(lo, hi, inj, q, q_len=m, s_len=n, k=k, interpret=True)
    )
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)
    assert (got == 127).any() and (got != 127).any()  # both outcomes exercised


def test_band_too_wide_raises(rng):
    q, s = make_case(rng, 1, 100, 8, 100, 32)  # band 65
    lo, hi, inj = pack.pack_banded(s, 32, 100)
    with pytest.raises(ValueError, match="band"):
        banded_ops.banded_xla(lo, hi, inj, q, q_len=100, s_len=100, k=32)
