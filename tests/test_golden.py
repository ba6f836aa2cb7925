"""End-to-end parity against committed golden outputs from the reference.

The golden file was produced by compiling and running the reference
implementation (original/BGSA_CPU aligner + convert) on its own sample data
(3 queries x 128 subjects x 500 bp, unit-cost global Myers).
"""

import os

import numpy as np

from bgsa_tpu import pipeline as pl_mod
from bgsa_tpu.io import result as result_io

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def test_sample_data_matches_reference_golden(tmp_path):
    res = str(tmp_path / "r.bin")
    cfg = pl_mod.PipelineConfig(backend="xla")
    stats = pl_mod.run_alignment(
        os.path.join(REPO, "sample-data", "query.txt"),
        os.path.join(REPO, "sample-data", "subject.txt"),
        res,
        config=cfg,
    )
    assert (stats.query_count, stats.subject_count) == (3, 128)
    out = str(tmp_path / "conv.txt")
    result_io.convert_result(res, out)
    got = open(out).read()
    want = open(os.path.join(HERE, "golden", "sample_myers_global.txt")).read()
    assert got == want


def test_multibucket_matches_reference_golden(tmp_path):
    """Bucket boundaries, tail-bucket shape padding, and N-lane pads — the
    golden scores were produced by the compiled reference on a 2000-subject
    file split into 4 buckets (bucket_size=40000)."""
    res = str(tmp_path / "r.bin")
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=40000)
    stats = pl_mod.run_alignment(
        os.path.join(HERE, "golden", "multibucket_query.txt"),
        os.path.join(HERE, "golden", "multibucket_subject.txt"),
        res,
        config=cfg,
    )
    assert (stats.query_count, stats.subject_count) == (5, 2000)
    out = str(tmp_path / "conv.txt")
    result_io.convert_result(res, out)
    got = open(out).read()
    want = open(os.path.join(HERE, "golden", "multibucket_scores.txt")).read()
    assert got == want


def test_sample_bitpal_matches_reference_golden(tmp_path):
    """Golden produced by the reference's committed generated BitPAl kernel
    (original/BGSA_AVX2/align_core.c: match 2, mismatch -3, gap -5), compiled
    and run on sample-data.

    Runs the first query only (the 500 bp x 17-word XLA scan costs ~25 s per
    query on the 1-core CPU CI) and compares against that query's slice of
    the committed golden — converted text is query-major, so query 0's
    scores are the first `subject_count` lines. The full 3-query case runs
    against the same compiled reference in test_reference_diff."""
    from bgsa_tpu.io import seqfile
    from bgsa_tpu.schemes import Scoring

    queries = seqfile.read_queries(os.path.join(REPO, "sample-data", "query.txt"))
    qp = str(tmp_path / "q1.txt")
    seqfile.write_seq_file(qp, queries[:1])

    res = str(tmp_path / "r.bin")
    cfg = pl_mod.PipelineConfig(backend="xla")
    stats = pl_mod.run_alignment(
        qp,
        os.path.join(REPO, "sample-data", "subject.txt"),
        res,
        scoring=Scoring(2, -3, -5),
        config=cfg,
    )
    out = str(tmp_path / "conv.txt")
    result_io.convert_result(res, out)
    got = open(out).read().splitlines()
    want = open(os.path.join(HERE, "golden", "sample_bitpal_2_m3_m5.txt")).read().splitlines()
    assert got == want[: stats.subject_count]
