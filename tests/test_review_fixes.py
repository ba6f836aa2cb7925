"""Regression tests for the round-3 self-review findings: resume geometry
validation, lane-pad transport choice, skewed-ratio tail padding, and
role-local nib warm-up."""

import numpy as np
import pytest

from bgsa_tpu import api, pack
from bgsa_tpu import pipeline as pl_mod
from bgsa_tpu.io import seqfile
from bgsa_tpu.schemes import Mode, Scoring, normalize


def _write_ds(tmp_path, rng, S, n, Q=2, m=16):
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    return qp, sp


def test_resume_with_changed_bucket_size_restarts(tmp_path, rng):
    """A completed (or partial) run resumed under a different --bucket-size
    must start fresh: counting done buckets in the old geometry and then
    skipping new-geometry buckets would silently interleave two layouts
    under the old header."""
    n = 20
    qp, sp = _write_ds(tmp_path, rng, S=700, n=n)
    cfg_a = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))
    cfg_b = pl_mod.PipelineConfig(backend="xla", bucket_size=128 * (n + 1))

    ref = str(tmp_path / "ref.bin")
    pl_mod.run_alignment(qp, sp, ref, config=cfg_b)

    out = str(tmp_path / "out.bin")
    pl_mod.run_alignment(qp, sp, out, config=cfg_a)
    pl_mod.run_alignment(qp, sp, out, config=cfg_b, resume=True)
    assert open(out, "rb").read() == open(ref, "rb").read()
    assert open(out + ".info", "rb").read() == open(ref + ".info", "rb").read()


def test_shard_resume_with_changed_bucket_size_refuses(tmp_path, rng):
    """Shard resume validates the recorded run geometry from the sidecar."""
    n = 20
    qp, sp = _write_ds(tmp_path, rng, S=700, n=n)
    cfg_a = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))
    cfg_b = pl_mod.PipelineConfig(backend="xla", bucket_size=128 * (n + 1))
    out = str(tmp_path / "s0.bin")
    pl_mod.run_alignment(qp, sp, out, config=cfg_a, shard=(0, 2))
    with pytest.raises(ValueError, match="bucket size"):
        pl_mod.run_alignment(qp, sp, out, config=cfg_b, shard=(0, 2),
                             resume=True)


def test_api_lane_pads_keep_2bit_transport(rng):
    """In-memory align() pads lanes with code 0 so an N-free batch stays on
    the 2-bit transport (an 'N' fill would double the upload bytes)."""
    codes = rng.integers(0, 4, size=(130, 40)).astype(np.int32)
    padded, count = api._pad_lanes(codes, 128)
    assert count == 130 and padded.shape[0] == 256
    transport, _ = pack.select_transport(padded.astype(np.uint8))
    assert transport == "2bit"
    # and the pad rows do not change the real scores
    out = api.align(["A" * 40] * 2, ["".join("ACGT"[c] for c in row)
                                     for row in codes])
    assert out.shape == (2, 130)


def test_skewed_ratio_tail_slice_compiles_one_geometry(tmp_path, rng):
    """host_slice gives the last host the remainder, so a tail bucket's
    slice can exceed that host's full-bucket slice (1280->256 vs 1152->384
    at ratios .4/.4/.2): padding must cover the max slice over all buckets
    or a second geometry compiles mid-run."""
    n = 20
    qp, sp = _write_ds(tmp_path, rng, S=1280 + 1152, n=n)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=1280 * (n + 1))
    engine = pl_mod.Engine(normalize(Scoring(0, -1, -1), Mode.GLOBAL), cfg)
    out = str(tmp_path / "s2.bin")
    pl_mod.run_bucketed(engine, qp, sp, out, cfg, shard=(2, 3),
                        shard_ratios=(0.4, 0.4, 0.2), resume=False,
                        write_dtype=np.int16)
    rows_seen = {k[2] for k in engine._exec}
    assert rows_seen == {384}, rows_seen


def test_nib_warm_only_for_pad_owning_role(tmp_path, rng):
    """Only the --host role whose final-bucket slice overlaps the 'N' lane
    pads pre-warms the nibble transport; other roles stay 2-bit-only."""
    n = 20
    # 700 = 5*128 + 60: 68 pad rows in the last bucket
    qp, sp = _write_ds(tmp_path, rng, S=700, n=n)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=512 * (n + 1))
    transports = {}
    for host in (0, 1):
        engine = pl_mod.Engine(normalize(Scoring(0, -1, -1), Mode.GLOBAL), cfg)
        out = str(tmp_path / f"h{host}.bin")
        pl_mod.run_bucketed(engine, qp, sp, out, cfg, shard=(host, 2),
                            shard_ratios=None, resume=False,
                            write_dtype=np.int16)
        transports[host] = {k[4] for k in engine._exec}
    assert "nib" not in transports[0], transports
    assert "nib" in transports[1], transports


def test_resume_point_uses_partial_manifest_prefix(tmp_path, rng):
    """A SIGKILL mid-run leaves fewer .info records than the header's
    block_num; the complete-record prefix must resume (done > 0), not
    restart from scratch (a 10M run has ~53 buckets of finished work)."""
    from bgsa_tpu.io import result as result_io

    n = 20
    qp, sp = _write_ds(tmp_path, rng, S=700, n=n)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))
    out = str(tmp_path / "full.bin")
    pl_mod.run_alignment(qp, sp, out, config=cfg)
    want = open(out, "rb").read()
    want_info = open(out + ".info", "rb").read()

    db = seqfile.DatabaseReader(sp, cfg.bucket_size, cfg.v_num)
    counts = db.bucket_counts()
    b0_bytes = counts[0][0] * 2 * 2  # bucket-0 rows x 2 queries x int16
    # crash state: manifest has only bucket 0's record; result holds bucket 0
    # plus half of bucket 1
    with open(out + ".info", "r+b") as f:
        f.truncate(16 + 8 + 4)
    with open(out, "r+b") as f:
        f.truncate(b0_bytes + 100)

    done = result_io.resume_point(out, 2, write_dtype=np.int16,
                                  expected_buckets=counts)
    assert done == 1

    pl_mod.run_alignment(qp, sp, out, config=cfg, resume=True)
    assert open(out, "rb").read() == want
    assert open(out + ".info", "rb").read() == want_info


def test_convert_rejects_truncated_result(tmp_path, rng):
    """convert must fail cleanly on a result file shorter than its manifest
    describes — the native walker would otherwise read the mmap past EOF
    (SIGSEGV) and the Python memmap path would silently emit fewer lines."""
    from bgsa_tpu.io import result as result_io

    n = 20
    qp, sp = _write_ds(tmp_path, rng, S=300, n=n)
    out = str(tmp_path / "r.bin")
    pl_mod.run_alignment(qp, sp, out, config=pl_mod.PipelineConfig(backend="xla"))
    with open(out, "r+b") as f:
        f.truncate(100)
    with pytest.raises(ValueError, match="manifest describes"):
        result_io.convert_result(out, str(tmp_path / "r.txt"),
                                 write_dtype=np.int16)
