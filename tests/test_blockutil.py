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
    # a zero/negative limit (degenerate VMEM budget formula) clamps to the
    # 8-sublane floor instead of emitting a 0-row block
    assert blockutil.choose_rows(64, 0) == (8, 64)


def test_kernel_wrappers_reject_non_lane_multiple_subjects(rng):
    """Every Pallas wrapper validates S % 128 == 0 up front — a ragged count
    would otherwise reshape-fail (or worse, mis-tile) deep inside Mosaic."""
    from bgsa_tpu.ops import banded, bitpal, bitpal_packed
    from bgsa_tpu.ops import myers_pallas, myers_semiglobal

    s = rng.integers(0, 4, size=(100, 40))  # not a multiple of 128
    q = np.zeros((1, 40), np.int32)
    eq31, eq32 = pack.pack_eq(s, 31), pack.pack_eq(s, 32)
    kw = dict(read_len=40, interpret=True)
    with pytest.raises(ValueError, match="multiple of 128"):
        myers_pallas.myers_global(eq31, q, **kw)
    with pytest.raises(ValueError, match="multiple of 128"):
        myers_semiglobal.myers_semiglobal(eq32, q, **kw)
    with pytest.raises(ValueError, match="multiple of 128"):
        bitpal.bitpal(eq31, q, match=2, mismatch=-3, gap=-5, **kw)
    with pytest.raises(ValueError, match="multiple of 128"):
        bitpal_packed.bitpal_packed(eq31, q, match=2, mismatch=-3, gap=-5, **kw)
    stream = np.asarray(pack.pack_banded_stream_jax(s, 5, 40))
    with pytest.raises(ValueError, match="multiple of 128"):
        banded.banded_stream(stream, q, q_len=40, s_len=40, k=5, interpret=True)
    streams = np.asarray(pack.pack_banded_streams_jax(s, 5, 42))
    with pytest.raises(ValueError, match="multiple of 128"):
        banded.banded_stream_dual(streams, np.zeros((1, 42), np.int32),
                                  q_len=42, s_len=40, k=5, interpret=True)
    lo, hi, inj = (np.asarray(a) for a in pack.pack_banded_jax(s[:, :4], 5, 6))
    with pytest.raises(ValueError, match="multiple of 128"):
        banded.banded(lo, hi, inj, np.zeros((1, 6), np.int32),
                      q_len=6, s_len=4, k=5, interpret=True)


def test_banded_geometry_rejects_short_subjects():
    """_geometry's h < 0 check (subject shorter than query - k) fires on the
    XLA twin too, not just the stream wrappers' own messages."""
    from bgsa_tpu.ops import banded

    lo = np.zeros((5, 128), np.uint32)
    hi = np.zeros((5, 128), np.uint32)
    inj = np.zeros((5, 1, 128), np.uint32)
    with pytest.raises(ValueError, match="subject_len >= query_len"):
        banded.banded_xla(lo, hi, inj, np.zeros((1, 40), np.int32),
                          q_len=40, s_len=20, k=5)


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
