"""Grid-block sizing: awkward row counts must not break the Pallas wrappers.

Regression: a 760k-subject bucket gives 5942 lane rows whose best divisor is
2 — Mosaic requires sublane blocks of 8 (or the whole axis), so the wrappers
pad the row axis instead of searching divisors.
"""

import numpy as np
import pytest

from bgsa_tpu import oracle, pack
from bgsa_tpu.ops import blockutil
from bgsa_tpu.schemes import Mode, Scoring


def test_choose_rows():
    assert blockutil.choose_rows(5942, 128) == (128, 6016)
    assert blockutil.choose_rows(11, 8) == (8, 16)
    assert blockutil.choose_rows(11, 128) == (11, 11)  # whole axis
    assert blockutil.choose_rows(3, 128) == (3, 3)
    assert blockutil.choose_rows(256, 100) == (96, 288)
    r, padded = blockutil.choose_rows(5942, 128, 1)  # tiny VMEM budget
    assert r == 8 and padded % 8 == 0


@pytest.fixture
def awkward(rng):
    # 11 lane rows (prime-ish), rows_per_block=8 -> one padded block
    Q, m, S, n = 2, 40, 11 * 128, 37
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(S, n))
    return q, s, m, n


def test_myers_padded_blocks(awkward):
    from bgsa_tpu.ops import myers_pallas

    q, s, m, n = awkward
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        myers_pallas.myers_global(eq, q, read_len=n, rows_per_block=8, interpret=True)
    )
    want = np.stack([-oracle.edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_semiglobal_padded_blocks(awkward):
    from bgsa_tpu.ops import myers_semiglobal

    q, s, m, n = awkward
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        myers_semiglobal.myers_semiglobal(
            eq, q, read_len=n, rows_per_block=8, interpret=True
        )
    )
    want = np.stack(
        [-oracle.edit_distances(qi, s, Mode.SEMI_GLOBAL) for qi in q]
    )
    np.testing.assert_array_equal(got, want)


def test_bitpal_padded_blocks(awkward):
    from bgsa_tpu.ops import bitpal, bitpal_packed

    q, s, m, n = awkward
    eq = pack.pack_eq(s, 31)
    kw = dict(match=2, mismatch=-3, gap=-5, read_len=n)
    want = np.stack([oracle.align_scores(qi, s, Scoring(2, -3, -5)) for qi in q])
    got = np.asarray(bitpal.bitpal(eq, q, rows_per_block=8, interpret=True, **kw))
    np.testing.assert_array_equal(got, want)
    got = np.asarray(
        bitpal_packed.bitpal_packed(eq, q, rows_per_block=8, interpret=True, **kw)
    )
    np.testing.assert_array_equal(got, want)


def test_banded_padded_blocks(rng):
    from bgsa_tpu.banded_ref import banded_scores
    from bgsa_tpu.ops import banded

    Q, m, S, n, k = 2, 64, 11 * 128, 70, 6
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(S, n))
    s[: S // 3, :m] = q[0]
    init_lo, init_hi, inj = pack.pack_banded(s, k, m)
    got = np.asarray(
        banded.banded(
            init_lo, init_hi, inj, q, q_len=m, s_len=n, k=k,
            rows_per_block=8, interpret=True,
        )
    )
    want = np.stack([banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)
