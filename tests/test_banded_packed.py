"""Packed banded kernel: bit-exactness vs the banded_ref golden model and
the existing kernels, field-geometry edges, and eligibility gating."""

import numpy as np
import pytest

from bgsa_tpu import banded_ref, pack
from bgsa_tpu.ops import banded as banded_ops
from bgsa_tpu.ops import banded_packed as bp

from test_banded import make_case


@pytest.mark.parametrize(
    "m,n,k,n_sub",
    [
        (150, 150, 8, 3),   # headline geometry: pitch 18, 3 fields
        (150, 158, 8, 2),   # longer subjects: band 25, pitch 26, straddle
        (100, 100, 4, 6),   # narrow band: 6 fields of pitch 10
        (150, 150, 15, 2),  # widest packable equal-length band (31 bits)
        (96, 128, 6, 1 + 64 // 46 - 1),  # h >> k: band 45 -> pitch 46, 1 field
    ],
)
def test_eligibility(m, n, k, n_sub):
    got = bp.packed_subbands(m, n, k)
    if n_sub >= 2:
        assert got == n_sub
    else:
        assert got == 0


def test_eligibility_rejects_short_subjects_and_overflow():
    assert bp.packed_subbands(150, 140, 8) == 0  # h < k geometry
    # matches-field overflow: pitch 10 fields hold counts < 512 only
    assert bp.packed_subbands(600, 600, 4) == 0
    assert bp.packed_subbands(500, 500, 4) == 6


@pytest.mark.parametrize("m,n,k", [(150, 150, 8), (150, 158, 8), (100, 100, 4),
                                   (150, 150, 15), (70, 70, 8), (500, 500, 8)])
def test_xla_twin_matches_bitport(rng, m, n, k):
    n_sub = bp.packed_subbands(m, n, k)
    S = n_sub * 128
    q, s = make_case(rng, 2, m, S, n, k)
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    got = np.asarray(bp.banded_packed_xla(streams, q, q_len=m, s_len=n, k=k))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("m,n,k", [(150, 150, 8), (150, 158, 8), (72, 76, 4)])
def test_pallas_matches_stream_kernel(rng, m, n, k):
    # n_sub capped at 4 here: interpret mode rejects wider packings (the
    # XLA CPU simplifier livelocks on the inlined network — see
    # banded_stream_packed); n_sub = 5/6 ride banded_packed_xla below and
    # the on-chip scripts/tpu_parity.py Mosaic check.
    n_sub = bp.packed_subbands(m, n, k)
    S = n_sub * 256  # two lane rows per chunk
    q, s = make_case(rng, 3, m, S, n, k)
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    got = np.asarray(bp.banded_stream_packed(streams, q, q_len=m, s_len=n,
                                             k=k, interpret=True))
    stream = np.asarray(pack.pack_banded_stream_jax(np.asarray(s, np.int32), k, m))
    want = np.asarray(banded_ops.banded_stream(stream, q, q_len=m, s_len=n,
                                               k=k, interpret=True))
    np.testing.assert_array_equal(got, want)
    assert (got == 127).any() and (got != 127).any()


def test_pallas_multi_block_rows(rng):
    # rows_per_block smaller than the row count: grid blocking + row padding
    m, n, k = 150, 150, 8
    n_sub = bp.packed_subbands(m, n, k)
    S = n_sub * 3 * 128
    q, s = make_case(rng, 2, m, S, n, k)
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    got = np.asarray(bp.banded_stream_packed(
        streams, q, q_len=m, s_len=n, k=k, interpret=True, rows_per_block=2))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_block_exit_off_is_identical(rng):
    m, n, k = 150, 150, 8
    n_sub = bp.packed_subbands(m, n, k)
    q, s = make_case(rng, 2, m, n_sub * 128, n, k)
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    kw = dict(q_len=m, s_len=n, k=k, interpret=True)
    a = np.asarray(bp.banded_stream_packed(streams, q, block_exit=True, **kw))
    b = np.asarray(bp.banded_stream_packed(streams, q, block_exit=False, **kw))
    np.testing.assert_array_equal(a, b)


def test_all_garbage_early_exit_scores(rng):
    # every subject random: the whole-block exit path must still report 127
    # for dead lanes and exact scores for any stragglers
    m, n, k = 150, 150, 8
    n_sub = bp.packed_subbands(m, n, k)
    q = rng.integers(0, 4, size=(2, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(n_sub * 128, n))
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    got = np.asarray(bp.banded_stream_packed(streams, q, q_len=m, s_len=n,
                                             k=k, interpret=True))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_short_query_no_checkpoint(rng):
    # q_len < 64: single checkpoint at q_len; exercises the static-tail latch
    m, n, k = 40, 48, 4
    n_sub = bp.packed_subbands(m, n, k)
    assert n_sub >= 2
    q, s = make_case(rng, 2, m, n_sub * 128, n, k)
    streams = bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)
    got = np.asarray(bp.banded_packed_xla(streams, q, q_len=m, s_len=n, k=k))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_engine_routes_packed(rng):
    """BandedEngine routes eligible geometries to the packed kernel (with
    shard padding to the n_sub*128 chunk multiple) and produces scores
    identical to the stream-kernel path and the golden model."""
    from bgsa_tpu.banded_pipeline import BandedEngine
    from bgsa_tpu.pipeline import PipelineConfig

    m, n, k = 150, 150, 8
    q = rng.integers(0, 4, size=(2, m)).astype(np.int32)
    # 256 subjects: NOT a multiple of n_sub*128 = 384 -> exercises padding
    s = rng.integers(0, 4, size=(256, n)).astype(np.uint8)
    on = BandedEngine(k, PipelineConfig(backend="pallas", interpret=True))
    off = BandedEngine(k, PipelineConfig(backend="pallas", interpret=True,
                                         banded_packed=False))
    got = np.asarray(on.scores(q, s))
    np.testing.assert_array_equal(got, np.asarray(off.scores(q, s)))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q],
                    dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_interpret_rejects_wide_packing(rng):
    # n_sub >= 5 in interpret mode: loud error (XLA CPU simplifier
    # livelock), and the engine silently falls back to the stream kernel.
    from bgsa_tpu.banded_pipeline import BandedEngine
    from bgsa_tpu.pipeline import PipelineConfig

    m, n, k = 100, 100, 4
    assert bp.packed_subbands(m, n, k) == 6
    q = rng.integers(0, 4, size=(1, m)).astype(np.int32)
    s = np.asarray(rng.integers(0, 4, size=(6 * 128, n)), np.int32)
    streams = bp.pack_packed_streams_jax(s, k, m, 6)
    with pytest.raises(ValueError, match="interpret mode supports"):
        bp.banded_stream_packed(streams, q, q_len=m, s_len=n, k=k,
                                interpret=True)
    eng = BandedEngine(k, PipelineConfig(backend="pallas", interpret=True))
    got = np.asarray(eng.scores(q, s[:256].astype(np.uint8)))
    want = np.array([banded_ref.banded_scores(qi, s[:256], k) for qi in q],
                    dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_engine_packed_ineligible_geometry_unchanged(rng):
    # wide band (k=15 at equal length packs 2; k=16 -> pitch 34 -> 1 field):
    # the engine must silently ride the stream kernel
    from bgsa_tpu.banded_pipeline import BandedEngine
    from bgsa_tpu.pipeline import PipelineConfig

    m, n, k = 80, 80, 16
    assert bp.packed_subbands(m, n, k) == 0
    q = rng.integers(0, 4, size=(1, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(128, n)).astype(np.uint8)
    eng = BandedEngine(k, PipelineConfig(backend="pallas", interpret=True))
    got = np.asarray(eng.scores(q, s))
    want = np.array([banded_ref.banded_scores(qi, s, k) for qi in q],
                    dtype=np.int8)
    np.testing.assert_array_equal(got, want)


def test_static_cols_is_mosaic_only(rng):
    # static_cols (the measured-and-rejected full-unroll A/B probe) feeds
    # the XLA CPU simplifier its livelock shape in interpret mode: loud
    # rejection instead of a hung compile. On-chip use is exercised by
    # scripts/exp_banded_packed_static.py (bit-exact gate there).
    m, n, k = 150, 150, 8
    q = rng.integers(0, 4, size=(1, m)).astype(np.int32)
    s = np.asarray(rng.integers(0, 4, size=(3 * 128, n)), np.int32)
    streams = bp.pack_packed_streams_jax(s, k, m, 3)
    with pytest.raises(ValueError, match="Mosaic"):
        bp.banded_stream_packed(streams, q, q_len=m, s_len=n, k=k,
                                interpret=True, static_cols=True)


def test_wrapper_validates_chunks(rng):
    m, n, k = 150, 150, 8
    q = rng.integers(0, 4, size=(1, m)).astype(np.int32)
    s = np.asarray(rng.integers(0, 4, size=(2 * 128, n)), np.int32)
    streams = bp.pack_packed_streams_jax(s, k, m, 2)  # wrong chunk count
    with pytest.raises(ValueError, match="3 sub-bands"):
        bp.banded_stream_packed(streams, q, q_len=m, s_len=n, k=k,
                                interpret=True)
    with pytest.raises(ValueError, match="multiple of"):
        bp.pack_packed_streams_jax(s[:200], k, m, 3)
