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
    # k=20, subjects 45bp longer than queries: band 86 > 64 while the
    # preload (bit 41) fits — exercises the band check specifically.
    q, s = make_case(rng, 1, 100, 8, 145, 20)
    lo, hi, inj = pack.pack_banded(s, 20, 100)
    with pytest.raises(ValueError, match="band of 86"):
        banded_ops.banded_xla(lo, hi, inj, q, q_len=100, s_len=145, k=20)


class TestBandedStream:
    """banded_stream (funnel-shift Eq window) vs the behavioral reference."""

    def _check(self, rng, Q, m, S, n, k):
        from bgsa_tpu import pack
        from bgsa_tpu.banded_ref import banded_scores
        from bgsa_tpu.ops import banded as b

        q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
        s = rng.integers(0, 4, size=(S, n))
        s[: S // 3, : min(m, n)] = q[0][: min(m, n)]  # some near-hits
        stream = np.asarray(pack.pack_banded_stream_jax(s, k, m))
        got = np.asarray(
            b.banded_stream(stream, q, q_len=m, s_len=n, k=k, interpret=True)
        )
        want = np.stack([banded_scores(qi, s, k) for qi in q])
        np.testing.assert_array_equal(got, want)

    def test_equal_lengths(self, rng):
        self._check(rng, 2, 64, 256, 64, 6)

    def test_subject_longer(self, rng):
        self._check(rng, 2, 64, 256, 80, 8)  # h > k: split streams

    def test_subject_shorter_rejected(self, rng):
        # h < k: the preload exceeds the band; the stream view can't
        # represent it (the engine falls back to banded() there).
        import pytest

        from bgsa_tpu import pack
        from bgsa_tpu.ops import banded as b

        s = rng.integers(0, 4, size=(128, 64))
        stream = pack.pack_banded_stream_jax(s, 8, 70)
        with pytest.raises(ValueError, match="s_len >= q_len"):
            b.banded_stream(np.asarray(stream), np.zeros((1, 70), np.int32),
                            q_len=70, s_len=64, k=8, interpret=True)

    def test_engine_fallback_subject_shorter(self, rng, tmp_path):
        # pipeline-level: shorter subjects route to the dual-stream kernel
        from bgsa_tpu.banded_pipeline import BandedEngine
        from bgsa_tpu.banded_ref import banded_scores
        from bgsa_tpu.pipeline import PipelineConfig

        q = rng.integers(0, 4, size=(2, 70)).astype(np.int32)
        s = rng.integers(0, 4, size=(128, 64))
        eng = BandedEngine(8, PipelineConfig(backend="pallas", interpret=True))
        got = np.asarray(eng.scores(q, s.astype(np.uint8)))
        want = np.stack([banded_scores(qi, s, 8) for qi in q])
        np.testing.assert_array_equal(got, want)

    def test_band_at_64_limit(self, rng):
        # band_length = k + h + 1 = 64 exactly: band_down = 63, the one
        # geometry where _stream_column leaves eq_hi unmasked
        m, k = 100, 31
        n = m + 1  # h = 32
        self._check(rng, 2, m, 256, n, k)

    def test_band_at_63(self, rng):
        self._check(rng, 2, 100, 256, 100, 31)  # band_down = 62, masked

    def test_tiny_threshold(self, rng):
        self._check(rng, 2, 150, 256, 150, 1)

    def test_block_exit_off_matches_on(self, rng):
        # The block_exit=False A/B control (docs/PERF.md "What bounds the
        # kernels" #8) must be outcome-neutral: same scores with the
        # whole-block while_loop replaced by a plain fori_loop. Mixed data
        # so some lanes die early and some survive to the end.
        from bgsa_tpu import pack
        from bgsa_tpu.banded_ref import banded_scores
        from bgsa_tpu.ops import banded as b

        Q, m, S, n, k = 2, 100, 256, 110, 8
        q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
        s = rng.integers(0, 4, size=(S, n))
        s[: S // 3, :m] = q[0]
        stream = np.asarray(pack.pack_banded_stream_jax(s, k, m))
        kw = dict(q_len=m, s_len=n, k=k, interpret=True)
        on = np.asarray(b.banded_stream(stream, q, **kw))
        off = np.asarray(b.banded_stream(stream, q, block_exit=False, **kw))
        np.testing.assert_array_equal(on, off)
        want = np.stack([banded_scores(qi, s, k) for qi in q])
        np.testing.assert_array_equal(on, want)


class TestBandedStreamDual:
    """banded_stream_dual (two funnel streams) covers s_len < q_len (h < k):
    window = A | (B & band mask); parity vs the behavioral reference."""

    def _check(self, rng, Q, m, S, n, k, unroll=None):
        from bgsa_tpu import pack
        from bgsa_tpu.banded_ref import banded_scores
        from bgsa_tpu.ops import banded as b

        q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
        s = rng.integers(0, 4, size=(S, n))
        s[: S // 3, : min(m, n)] = q[0][: min(m, n)]  # some near-hits
        streams = np.asarray(pack.pack_banded_streams_jax(s, k, m))
        kw = dict(q_len=m, s_len=n, k=k, interpret=True)
        if unroll:
            kw["unroll"] = unroll
        got = np.asarray(b.banded_stream_dual(streams, q, **kw))
        want = np.stack([banded_scores(qi, s, k) for qi in q])
        np.testing.assert_array_equal(got, want)

    def test_subject_shorter(self, rng):
        self._check(rng, 2, 70, 256, 64, 8)  # h = 2 < k

    def test_h_zero(self, rng):
        self._check(rng, 2, 72, 256, 64, 8)  # h = 0: tightest band

    def test_just_below_equal(self, rng):
        self._check(rng, 2, 65, 256, 64, 6)  # h = 5

    def test_wide_band_hi_word(self, rng):
        # band_down >= 32 exercises the B-hi funnel; 2k >= 32 the A-hi one
        self._check(rng, 2, 110, 256, 100, 24)  # h = 14, band_down = 38

    def test_small_k_small_band(self, rng):
        self._check(rng, 2, 66, 256, 64, 3)  # h = 1, 2k < 32

    def test_unrolled(self, rng):
        self._check(rng, 2, 70, 256, 64, 8, unroll=4)

    def test_unrolled_head_remainder(self, rng):
        # q_len < start_batch*32 caps the dual head at q_len = 41, which is
        # not a multiple of unroll=4 — the static remainder loop after the
        # head fori_loop (banded.py's lone column2 tail) must run columns
        # 40..40; no other geometry reaches it (a coverage sweep showed it
        # unhit at every tuned unroll).
        self._check(rng, 2, 41, 256, 30, 20, unroll=4)

    def test_matches_equal_length_stream(self, rng):
        # h == k boundary: both kernels accept it; outputs must agree
        from bgsa_tpu import pack
        from bgsa_tpu.ops import banded as b

        m = n = 64
        k = 6
        q = rng.integers(0, 4, size=(2, m)).astype(np.int32)
        s = rng.integers(0, 4, size=(256, n))
        one = np.asarray(b.banded_stream(
            np.asarray(pack.pack_banded_stream_jax(s, k, m)), q,
            q_len=m, s_len=n, k=k, interpret=True))
        two = np.asarray(b.banded_stream_dual(
            np.asarray(pack.pack_banded_streams_jax(s, k, m)), q,
            q_len=m, s_len=n, k=k, interpret=True))
        np.testing.assert_array_equal(one, two)

    def test_widest_supported_k(self, rng):
        # k=31, h=30: band_down = 61, 2k = 62 — the widest dual geometry
        self._check(rng, 2, 100, 256, 99, 31)

    def test_preload_past_window_rejected(self, rng):
        # 2k > 63 with s_len >= k: the preload exceeds the 64-bit register
        # (reference UB too) — rejected by _geometry before the dual check.
        import pytest

        from bgsa_tpu import pack
        from bgsa_tpu.ops import banded as b

        s = rng.integers(0, 4, size=(128, 99))
        streams = np.asarray(pack.pack_banded_streams_jax(s, 32, 100))
        with pytest.raises(ValueError, match="preload"):
            b.banded_stream_dual(streams, np.zeros((1, 100), np.int32),
                                 q_len=100, s_len=99, k=32, interpret=True)

    def test_dual_rejects_wide_k_small_subjects(self, rng):
        # s_len < k keeps the preload in range, but the dual-stream
        # superposition itself needs 2k <= 63 — its own check still fires.
        import pytest

        from bgsa_tpu import pack
        from bgsa_tpu.ops import banded as b

        s = rng.integers(0, 4, size=(128, 20))
        streams = np.asarray(pack.pack_banded_streams_jax(s, 40, 55))
        with pytest.raises(ValueError, match="2k <= 63"):
            b.banded_stream_dual(streams, np.zeros((1, 55), np.int32),
                                 q_len=55, s_len=20, k=40, interpret=True)



class TestPreloadOverflow:
    """k + min(k, s_len) > 63: the 64-bit Peq preload cannot hold the first
    k subject chars (bits k+1..2k). Round 3 found the Peq-carry path
    silently truncating here (scores diverged from banded_ref); the
    reference's own C is shift-count UB in this corner, so every entry
    point now rejects it loudly."""

    def test_geometry_rejects(self):
        with pytest.raises(ValueError, match="preload"):
            banded_ops._geometry(100, 65, 40)  # band 46 fits, preload bit 80

    def test_packers_reject(self, rng):
        s = rng.integers(0, 4, size=(128, 65)).astype(np.uint8)
        with pytest.raises(ValueError, match="preload"):
            pack.pack_banded(s, 40, 100)
        with pytest.raises(ValueError, match="preload"):
            pack.pack_banded_jax(s, 40, 100)

    def test_small_subject_carry_corner_still_works(self, rng):
        # 2k > 63 but s_len < k keeps the preload at bit k+s_len <= 63:
        # the Peq-carry fallback remains valid there and matches the golden.
        k, m, n = 40, 55, 20  # h=5, band=46, preload top bit 60
        q = rng.integers(0, 4, size=(2, m)).astype(np.int32)
        s = rng.integers(0, 4, size=(128, n)).astype(np.uint8)
        want = np.array([banded_ref.banded_scores(qq, s, k) for qq in q])
        lo, hi, inj = pack.pack_banded(s, k, m)
        got = np.asarray(banded_ops.banded_xla(lo, hi, inj, q, q_len=m, s_len=n, k=k))
        np.testing.assert_array_equal(got, want)


def test_engine_routes_stream_and_peq_carry(rng):
    """BandedEngine's pallas routing, engine-level: the s_len >= q_len fast
    path (single funnel stream) and the 2k > 63, s_len < k corner (the one
    geometry left on the Peq-carry kernel) — the suite exercised both
    kernels directly but only the dual-stream route through the engine."""
    from bgsa_tpu.banded_pipeline import BandedEngine
    from bgsa_tpu.banded_ref import banded_scores
    from bgsa_tpu.pipeline import PipelineConfig

    cfg = PipelineConfig(backend="pallas", interpret=True)

    # s >= q: banded_stream
    q = rng.integers(0, 4, size=(2, 64)).astype(np.int32)
    s = rng.integers(0, 4, size=(128, 80))
    got = np.asarray(BandedEngine(6, cfg).scores(q, s.astype(np.uint8)))
    want = np.stack([banded_scores(qi, s, 6) for qi in q])
    np.testing.assert_array_equal(got, want)

    # 2k > 63 with s < k: Peq-carry fallback (preload k+s = 60 fits)
    q = rng.integers(0, 4, size=(2, 50)).astype(np.int32)
    s = rng.integers(0, 4, size=(128, 20))
    got = np.asarray(BandedEngine(40, cfg).scores(q, s.astype(np.uint8)))
    want = np.stack([banded_scores(qi, s, 40) for qi in q])
    np.testing.assert_array_equal(got, want)
