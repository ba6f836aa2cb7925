"""Round-4 regression tests.

1) Long-subject VMEM envelope: the reference kernels take any word_num
   (original/BGSA_SSE/cal_sse.c:253-257, chunk_read_num >= 1 at any
   max_length), but our Pallas blocks cannot shrink below Mosaic's 8-sublane
   floor, so past a per-family word count even the smallest block exceeds
   scoped VMEM and died inside Mosaic with no friendly error (round-3
   VERDICT Missing #3 / Weak #2). The wrappers now detect the geometry
   (blockutil.vmem_floor_exceeded) and route to their XLA twin.
"""

import numpy as np
import pytest

from bgsa_tpu import pack
from bgsa_tpu.oracle import edit_distances
from bgsa_tpu.ops import bitpal, bitpal_packed, blockutil, myers_pallas, myers_semiglobal


def test_vmem_floor_logic():
    # hard cap under the 8-row floor with more rows than it -> exceeded
    assert blockutil.vmem_floor_exceeded(rows=64, hard_rows=4)
    assert blockutil.vmem_floor_exceeded(rows=8, hard_rows=7)
    # whole array smaller than the cap fits as a full-dimension block
    assert not blockutil.vmem_floor_exceeded(rows=4, hard_rows=4)
    assert not blockutil.vmem_floor_exceeded(rows=3, hard_rows=7)
    # healthy caps never trigger
    assert not blockutil.vmem_floor_exceeded(rows=1000, hard_rows=8)
    assert not blockutil.vmem_floor_exceeded(rows=1000, hard_rows=56)
    # an over-cap full-array block still triggers (rows=6 > cap=5)
    assert blockutil.vmem_floor_exceeded(rows=6, hard_rows=5)


def _long_subjects(rng, count, length):
    return rng.integers(0, 4, size=(count, length))


def test_myers_fullword_12kbp_routes_to_xla(rng):
    # 12288 bp -> W=384 full words > the W=320 routing threshold
    # (hard_rows = 15MB/(12*384*512B) = 6 < 8) with rows = 1024/128 = 8.
    # Without the guard this is a Mosaic VMEM failure; with it, the call
    # must succeed on ANY backend (here CPU, where a non-interpret
    # pallas_call cannot run at all) and match the oracle.
    n = 12288
    q = rng.integers(0, 4, size=(1, 24)).astype(np.int32)
    s = _long_subjects(rng, 1024, n)
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        myers_semiglobal.myers_semiglobal(eq, q, read_len=n, factor=-1, is_global=True)
    )
    want = -edit_distances(q[0], s[:8])
    np.testing.assert_array_equal(got[0, :8], want)


def test_myers_31bit_12kbp_routes_to_xla(rng):
    n = 12400  # W = ceil(12400/31) = 400 words
    q = rng.integers(0, 4, size=(1, 16)).astype(np.int32)
    s = _long_subjects(rng, 1024, n)
    eq = pack.pack_eq(s, 31)
    got = np.asarray(myers_pallas.myers_global(eq, q, read_len=n, factor=-1))
    want = -edit_distances(q[0], s[:8])
    np.testing.assert_array_equal(got[0, :8], want)


def test_bitpal_packed_long_routes_to_xla(rng, monkeypatch):
    # (2,-3,-5): 5 planes + 10 Eq -> routes past W = 256 (~7.9 kbp).
    # The BitPAl twins keep Python word loops (their plane networks make a
    # word scan a much bigger rewrite), whose compile at W=300 costs minutes
    # — so this asserts the ROUTING via a recorder; the routed math itself
    # is the twin the rest of the suite already diffs against the compiled
    # reference, and the Myers 12 kbp tests above run their routed path
    # end-to-end.
    n = 9300  # W = 300
    q = rng.integers(0, 4, size=(1, 12)).astype(np.int32)
    s = _long_subjects(rng, 1024, n)
    eq = pack.pack_eq(s, 31)
    calls = []
    monkeypatch.setattr(
        bitpal_packed, "bitpal_packed_xla",
        lambda *a, **kw: calls.append((a, kw)) or np.zeros((1, s.shape[0]), np.int32),
    )
    bitpal_packed.bitpal_packed(
        eq, q, match=2, mismatch=-3, gap=-5, read_len=n, factor=1
    )
    assert len(calls) == 1
    assert calls[0][1]["read_len"] == n and calls[0][1]["match"] == 2


def test_bitpal_nonpacked_long_routes_to_xla(rng, monkeypatch):
    # (1,-2,-3): nvals = 7 planes + 10 Eq; routes past W = 226 (~7.0 kbp)
    n = 11500  # W = ceil(11500/31) = 371
    q = rng.integers(0, 4, size=(1, 10)).astype(np.int32)
    s = _long_subjects(rng, 1024, n)
    eq = pack.pack_eq(s, 31)
    calls = []
    monkeypatch.setattr(
        bitpal, "bitpal_xla",
        lambda *a, **kw: calls.append((a, kw)) or np.zeros((1, s.shape[0]), np.int32),
    )
    bitpal.bitpal(eq, q, match=1, mismatch=-2, gap=-3, read_len=n, factor=1)
    assert len(calls) == 1
    assert calls[0][1]["gap"] == -3 and calls[0][1]["read_len"] == n


@pytest.mark.parametrize("is_global", [True, False])
def test_xla_word_scan_matches_word_loop(rng, is_global):
    """The W > 64 word-scan variants of the XLA twins are bit-identical to
    the unrolled word loop across the dispatch boundary (65 words straddled
    against the oracle; the loop variant is oracle-checked suite-wide)."""
    from bgsa_tpu.oracle import Mode

    n = 65 * 32  # W = 65 full words -> scan path
    q = rng.integers(0, 4, size=(2, 21)).astype(np.int32)
    s = _long_subjects(rng, 128, n)
    eq = pack.pack_eq(s, 32)
    got = np.asarray(myers_semiglobal.myers_semiglobal_xla(
        eq, q, read_len=n, factor=-1, is_global=is_global))
    mode = Mode.GLOBAL if is_global else Mode.SEMI_GLOBAL
    want = np.stack([-edit_distances(qi, s, mode) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_xla_31bit_word_scan_matches_oracle(rng):
    from bgsa_tpu.ops import myers_xla

    n = 65 * 31  # W = 65 -> scan path
    q = rng.integers(0, 4, size=(2, 17)).astype(np.int32)
    s = _long_subjects(rng, 128, n)
    eq = pack.pack_eq(s, 31)
    got = np.asarray(myers_xla.myers_global(eq, q, read_len=n, factor=-1))
    want = np.stack([-edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_mid_envelope_stays_on_pallas(rng, monkeypatch):
    """8 kbp (W=250) exceeds the soft 10 MB sizing budget (blocks floor at
    8 rows) but fits the 15 MB hard cap — it must NOT be demoted to the XLA
    twin (routing on the soft budget would have cost Pallas speed for every
    ~7-10 kbp run). Recorder check: running the real W=250 kernel through
    the XLA-CPU compiler takes minutes, so the twin is patched to fail loud
    and pallas_call to a recorder returning the right shape."""
    n = 250 * 32
    q = rng.integers(0, 4, size=(1, 6)).astype(np.int32)
    s = _long_subjects(rng, 1024, n)
    eq = pack.pack_eq(s, 32)

    def no_route(*a, **kw):
        raise AssertionError("mid-envelope geometry was routed to the XLA twin")

    monkeypatch.setattr(myers_semiglobal, "myers_semiglobal_xla", no_route)
    pallas_calls = []
    real_pallas_call = myers_semiglobal.pl.pallas_call

    def fake_pallas_call(kernel, **kw):
        pallas_calls.append(kw["out_shape"].shape)
        return lambda *args: np.zeros(kw["out_shape"].shape, np.int32)

    monkeypatch.setattr(myers_semiglobal.pl, "pallas_call", fake_pallas_call)
    try:
        out = myers_semiglobal.myers_semiglobal(
            eq, q, read_len=n, factor=-1, is_global=True
        )
    finally:
        monkeypatch.setattr(myers_semiglobal.pl, "pallas_call", real_pallas_call)
    assert len(pallas_calls) == 1
    assert out.shape == (1, s.shape[0])


def test_bench_previous_round_reads_driver_wrapped_artifacts(tmp_path, monkeypatch):
    """The committed BENCH_r*.json artifacts are driver-wrapped (one JSON
    object whose "tail" embeds our stdout lines); the retry gate must parse
    those, pick the HIGHEST round (not lexicographic file order), and skip
    degraded lines — otherwise it silently falls back to the fixed
    threshold."""
    import json

    import bench

    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    line9 = json.dumps({"metric": "unit-cost Myers cal GCUPS", "value": 7000.0})
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"rc": 0, "tail": "noise\n" + line9 + "\n"}))
    # r10 sorts before r09 lexicographically ("BENCH_r10" > "BENCH_r09" is
    # fine, but "BENCH_r9" vs "BENCH_r10" is not) — use the int round
    line10 = json.dumps({"metric": "unit-cost Myers cal GCUPS", "value": 8100.0})
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"rc": 0, "tail": line10 + "\n"}))
    # a later degraded round must not win
    line11 = json.dumps({"metric": "[DEGRADED] unit-cost Myers cal GCUPS",
                         "value": 20.0, "degraded": True})
    (tmp_path / "BENCH_r11.json").write_text(
        json.dumps({"rc": 0, "tail": line11 + "\n"}))
    assert bench.previous_round_gcups() == 8100.0
    # plain-JSONL artifacts parse too
    (tmp_path / "BENCH_r12.json").write_text(line9 + "\n")
    assert bench.previous_round_gcups() == 7000.0


def test_short_subjects_still_use_pallas_path(rng):
    # A healthy geometry must not be re-routed: interpret=True only works on
    # the pallas_call path, so reaching it proves the guard stayed off.
    q = rng.integers(0, 4, size=(1, 12)).astype(np.int32)
    s = _long_subjects(rng, 256, 64)
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        myers_semiglobal.myers_semiglobal(
            eq, q, read_len=64, factor=-1, is_global=True, interpret=True
        )
    )
    want = -edit_distances(q[0], s)
    np.testing.assert_array_equal(got[0], want)
