import numpy as np
import pytest

from bgsa_tpu.io import result as result_io
from bgsa_tpu.io import seqfile, fastx


def write_lines(path, seqs):
    with open(path, "w") as f:
        for s in seqs:
            f.write(s + "\n")


def test_database_reader_single_bucket(tmp_path, rng):
    seqs = ["".join(np.random.default_rng(i).choice(list("ACGT"), 10)) for i in range(5)]
    path = tmp_path / "db.txt"
    write_lines(path, seqs)
    db = seqfile.DatabaseReader(str(path), v_num=4)
    assert db.bucket_count == 1
    buckets = list(db)
    assert len(buckets) == 1
    b = buckets[0]
    # padded up to v_num multiple: 5 -> 8, extra 3 all-'N' rows
    assert b.count == 8 and b.extra_count == 3
    assert (b.codes[5:] == 4).all()
    assert b.codes.shape == (8, 10)


def test_database_reader_multi_bucket(tmp_path):
    # 10 seqs of len 9 (stride 10); bucket_size 45 -> 4 per bucket, v_num 2 -> 4
    seqs = ["ACGTACGTA"] * 10
    path = tmp_path / "db.txt"
    write_lines(path, seqs)
    db = seqfile.DatabaseReader(str(path), bucket_size=45, v_num=2)
    buckets = list(db)
    assert [b.count for b in buckets] == [4, 4, 2]
    assert [b.extra_count for b in buckets] == [0, 0, 0]
    assert db.bucket_count == 3
    # last bucket needing padding
    db = seqfile.DatabaseReader(str(path), bucket_size=45, v_num=4)
    buckets = list(db)
    assert [b.count for b in buckets] == [4, 4, 4]
    assert [b.extra_count for b in buckets] == [0, 0, 2]


def test_read_queries_missing_trailing_newline(tmp_path):
    path = tmp_path / "q.txt"
    with open(path, "w") as f:
        f.write("ACGT\nTTTT")  # no trailing newline
    q = seqfile.read_queries(str(path))
    np.testing.assert_array_equal(q, [[0, 1, 2, 3], [3, 3, 3, 3]])


def test_result_roundtrip(tmp_path):
    # 2 blocks of subjects (counts 6 and 4, last has 1 pad), 3 queries,
    # ref_bucket_count=2 -> 2 query buckets
    res = str(tmp_path / "r.bin")
    w = result_io.ResultWriter(res, ref_count=3, block_num=2, device_num=1)
    rng = np.random.default_rng(0)
    blocks = [rng.integers(-100, 0, size=(3, 6)), rng.integers(-100, 0, size=(3, 4))]
    extras = [0, 1]
    for scores, extra in zip(blocks, extras):
        w.start_bucket([scores.shape[1]], extra)
        for qs in range(0, 3, 2):
            w.write_scores(scores[qs : qs + 2])
    w.close()

    info = result_io.read_info(res + ".info")
    assert info.block_num == 2 and info.ref_count == 3
    assert info.device_read_counts == [[6], [4]]
    assert info.extra_counts == [0, 1]

    out = str(tmp_path / "conv.txt")
    result_io.convert_result(res, out, ref_bucket_count=2)
    got = np.loadtxt(out, dtype=np.int64)
    # expected: query-major, blocks concatenated, pads dropped
    want = np.concatenate([blocks[0], blocks[1][:, :3]], axis=1).ravel()
    np.testing.assert_array_equal(got, want)


def test_fasta_fastq(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(">s1 desc\nACGT\nACGT\n>s2\nTTTT\n")
    out = tmp_path / "out.txt"
    fastx.convert_fasta(str(fa), str(out))
    assert out.read_text() == "ACGTACGT\nTTTT\n"

    fq = tmp_path / "in.fq"
    fq.write_text("@r1\nACGT\n+\n@@@@\n@r2\nGGGG\n+\nIIII\n")
    fastx.convert_fastq(str(fq), str(out))
    assert out.read_text() == "ACGT\nGGGG\n"


def test_fasta_fastq_crlf(tmp_path):
    # CRLF inputs must not leak '\r' into the fixed-length line format
    # (the aligner's mapping table would silently score it as 'A').
    fa = tmp_path / "in.fa"
    fa.write_bytes(b">s1\r\nACGT\r\nACGT\r\n>s2\r\nTTTT\r\n")
    out = tmp_path / "out.txt"
    fastx.convert_fasta(str(fa), str(out))
    assert out.read_bytes() == b"ACGTACGT\nTTTT\n"

    fq = tmp_path / "in.fq"
    fq.write_bytes(b"@r1\r\nACGT\r\n+\r\n@@@@\r\n@r2\r\nGGGG\r\n+\r\nIIII\r\n")
    fastx.convert_fastq(str(fq), str(out))
    assert out.read_bytes() == b"ACGT\nGGGG\n"


def test_query_file_trailing_blank_lines(tmp_path):
    from bgsa_tpu.io import seqfile

    p = str(tmp_path / "q.txt")
    open(p, "w").write("ACGT\nTTTT\n\n\n")
    q = seqfile.read_queries(p)
    assert q.shape == (2, 4)


def test_convert_dtype_inference(tmp_path, rng):
    """convert -r without --banded infers int8 vs int16 from the file size."""
    import bgsa_tpu
    from bgsa_tpu.banded_pipeline import run_banded
    from bgsa_tpu.io import result as result_io, seqfile
    from bgsa_tpu.pipeline import PipelineConfig, run_alignment

    q = rng.integers(0, 4, size=(2, 28))
    s = rng.integers(0, 4, size=(256, 28))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = PipelineConfig(backend="xla")

    full = str(tmp_path / "full.bin")
    run_alignment(qp, sp, full, config=cfg)
    assert result_io.infer_write_dtype(full) == np.int16
    a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    result_io.convert_result(full, a, write_dtype=None)
    result_io.convert_result(full, b, write_dtype=np.int16)
    assert open(a).read() == open(b).read()

    banded = str(tmp_path / "band.bin")
    run_banded(qp, sp, banded, 5, cfg)
    assert result_io.infer_write_dtype(banded) == np.int8
    c = str(tmp_path / "c.txt")
    result_io.convert_result(banded, c, write_dtype=None)
    assert len(open(c).read().splitlines()) == 512


def test_cli_accepts_fastx_inputs(tmp_path, rng):
    """bgsa-align converts FASTA/FASTQ inputs transparently."""
    from bgsa_tpu import cli
    from bgsa_tpu.io import result as result_io, seqfile

    q = rng.integers(0, 4, size=(2, 30))
    s = rng.integers(0, 4, size=(150, 30))
    lut = "ACGT"
    fq = str(tmp_path / "s.fq")
    with open(fq, "w") as f:
        for i, row in enumerate(s):
            seq = "".join(lut[c] for c in row)
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 30}\n")
    fa = str(tmp_path / "q.fa")
    with open(fa, "w") as f:
        for i, row in enumerate(q):
            seq = "".join(lut[c] for c in row)
            f.write(f">q{i}\n{seq[:15]}\n{seq[15:]}\n")
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    r1, r2 = str(tmp_path / "r1.bin"), str(tmp_path / "r2.bin")
    assert cli.main(["align", "-q", fa, "-d", fq, "-f", r1, "--backend", "xla",
                     "--quiet"]) == 0
    assert cli.main(["align", "-q", qp, "-d", sp, "-f", r2, "--backend", "xla",
                     "--quiet"]) == 0
    assert open(r1, "rb").read() == open(r2, "rb").read()


def test_input_error_branches(tmp_path, rng):
    """Malformed inputs fail with clear ValueErrors (the reference printf+
    exits or silently corrupts): ragged lines, empty files, impossible
    bucket sizes, and wrong-size result files."""
    ragged = tmp_path / "ragged.txt"
    ragged.write_bytes(b"ACGT\nACGTTT\n")  # size check catches this one
    with pytest.raises(ValueError, match="fixed-length"):
        seqfile.DatabaseReader(str(ragged))
    with pytest.raises(ValueError, match="fixed-length"):
        seqfile.read_queries(str(ragged))

    # Ragged files whose byte size happens to line up with the modulo check
    # (here: 14 ≡ 4 ≡ len mod stride) must still be caught — before the
    # newline-column validation they were silently misparsed, newlines
    # shifting into sequences as code 0 ('A').
    sneaky = tmp_path / "sneaky.txt"
    sneaky.write_bytes(b"ACGT\nACGTT\nAC\n")
    with pytest.raises(ValueError, match="ragged line"):
        list(seqfile.DatabaseReader(str(sneaky)))
    sneaky_q = tmp_path / "sneaky_q.txt"
    sneaky_q.write_bytes(b"ACGT\nACGTTTACG\n")  # 15 ≡ 0 mod stride
    with pytest.raises(ValueError, match="ragged line"):
        seqfile.read_queries(str(sneaky_q))

    empty = tmp_path / "empty.txt"
    empty.write_bytes(b"")
    with pytest.raises(ValueError, match="empty"):
        seqfile.DatabaseReader(str(empty))
    with pytest.raises(ValueError, match="empty"):
        seqfile.read_queries(str(empty))

    ok = tmp_path / "ok.txt"
    seqfile.write_seq_file(str(ok), rng.integers(0, 4, size=(300, 40)))
    with pytest.raises(ValueError, match="bucket_size too small"):
        seqfile.DatabaseReader(str(ok), bucket_size=41, v_num=128)

    # result size matching neither int8 nor int16 per the manifest
    res = tmp_path / "r.bin"
    w = result_io.ResultWriter(str(res), ref_count=2, block_num=1, device_num=1)
    w.start_bucket([4], 0)
    w.write_scores(np.zeros((2, 4), np.int16))
    w.close()
    with open(res, "ab") as f:
        f.write(b"\x00")  # 17 bytes: neither 8 (int8) nor 16 (int16)
    with pytest.raises(ValueError, match="int8 or int16"):
        result_io.infer_write_dtype(str(res))


def test_ratio_file_error_branches(tmp_path):
    from bgsa_tpu.parallel.multihost import read_ratio_file

    short = tmp_path / "short.txt"
    short.write_text("1.0 2.0\n")
    with pytest.raises(ValueError, match="need 3 values"):
        read_ratio_file(str(short), 3)
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 0.0\n")
    with pytest.raises(ValueError, match="zero or negative"):
        read_ratio_file(str(bad), 2)


def test_crlf_plain_format_rejected(tmp_path):
    """CRLF plain-format files error loudly — the '\r' would otherwise sit
    inside every sequence and score silently as 'A' (the reference's mapping
    table does exactly that)."""
    crlf = tmp_path / "crlf.txt"
    crlf.write_bytes(b"ACGT\r\nGGTA\r\n")
    with pytest.raises(ValueError, match="CRLF"):
        seqfile.DatabaseReader(str(crlf))
    with pytest.raises(ValueError, match="CRLF"):
        seqfile.read_queries(str(crlf))


def test_resume_rejects_wrong_dtype_result(tmp_path, rng):
    """Resuming a completed int16 full-alignment file as an int8 banded run
    must start fresh (before the size guard it counted every bucket done in
    int8 units, truncated half the bytes, and converted to garbage)."""
    from bgsa_tpu.banded_pipeline import run_banded
    from bgsa_tpu.pipeline import PipelineConfig, run_alignment

    q = rng.integers(0, 4, size=(2, 20))
    s = rng.integers(0, 4, size=(300, 20))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = PipelineConfig(backend="xla", bucket_size=128 * 21)

    res = str(tmp_path / "r.bin")
    run_alignment(qp, sp, res, config=cfg)  # int16 full run, completed

    # resume as banded over the same file: fresh start, correct output
    run_banded(qp, sp, res, 5, cfg, resume=True)
    clean = str(tmp_path / "clean.bin")
    run_banded(qp, sp, clean, 5, cfg)
    assert open(res, "rb").read() == open(clean, "rb").read()


def test_resume_rejects_smaller_dtype_result(tmp_path, rng):
    """The opposite mix-up: a completed int8 banded file resumed as an int16
    full run is byte-indistinguishable from a half-done int16 run by size
    alone — the .run.json sidecar (recorded by every fresh ResultWriter)
    carries the dtype, so resume starts fresh instead of truncating the
    banded bytes mid-bucket and appending int16 scores after them."""
    import os

    from bgsa_tpu.banded_pipeline import run_banded
    from bgsa_tpu.pipeline import PipelineConfig, run_alignment

    q = rng.integers(0, 4, size=(2, 20))
    s = rng.integers(0, 4, size=(512, 20))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = PipelineConfig(backend="xla", bucket_size=128 * 21)

    res = str(tmp_path / "r.bin")
    run_banded(qp, sp, res, 5, cfg)  # int8 banded run, completed
    assert os.path.exists(res + ".run.json")

    run_alignment(qp, sp, res, config=cfg, resume=True)
    clean = str(tmp_path / "clean.bin")
    run_alignment(qp, sp, clean, config=cfg)
    assert open(res, "rb").read() == open(clean, "rb").read()
    # the sidecar now records the new run's dtype
    import json

    assert json.load(open(res + ".run.json"))["write_dtype"] == "int16"


def test_resume_point_rejection_edges(tmp_path, rng):
    """resume_point's fresh-start decisions, each exercised directly:
    missing files, unreadable manifest, query-count mismatch, geometry
    mismatch, corrupt .run.json (ignored), and the oversized-guard fallback
    arms (complete manifest without expected geometry; partial manifest
    skips the guard)."""
    from bgsa_tpu.io import result as result_io

    res = str(tmp_path / "r.bin")
    # no files at all
    assert result_io.resume_point(res, 2) == 0

    # 2-bucket run: 256 + 128 rows, 2 queries, int16
    w = result_io.ResultWriter(res, ref_count=2, block_num=2, device_num=1)
    w.start_bucket([256], 0)
    w.write_scores(np.zeros((2, 256), np.int16))
    w.start_bucket([128], 0)
    w.write_scores(np.zeros((2, 128), np.int16))
    w.close()

    # wrong query count
    assert result_io.resume_point(res, 3) == 0
    # wrong bucket geometry
    assert result_io.resume_point(res, 2, expected_buckets=[(256, 0)]) == 0
    assert result_io.resume_point(
        res, 2, expected_buckets=[(300, 0), (84, 0)]) == 0
    # corrupt .run.json is ignored (not trusted, not fatal)
    with open(res + ".run.json", "w") as f:
        f.write("{not json")
    assert result_io.resume_point(
        res, 2, expected_buckets=[(256, 0), (128, 0)]) == 2
    # complete manifest + no expected geometry: oversized guard still fires
    with open(res, "ab") as f:
        f.write(b"\x00" * 4096)
    assert result_io.resume_point(res, 2) == 0

    # unreadable manifest
    with open(res + ".info", "wb") as f:
        f.write(b"\x01")
    assert result_io.resume_point(res, 2) == 0


def test_read_info_rejects_implausible_header(tmp_path):
    from bgsa_tpu.io import result as result_io

    p = str(tmp_path / "x.info")
    with open(p, "wb") as f:
        import struct

        f.write(struct.pack("<iiq", -5, 1, 2))
    with pytest.raises(ValueError, match="implausible header"):
        result_io.read_info(p)
