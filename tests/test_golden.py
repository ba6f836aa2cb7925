"""End-to-end parity against committed golden outputs from the reference.

The golden file was produced by compiling and running the reference
implementation (original/BGSA_CPU aligner + convert) on its own sample data
(3 queries x 128 subjects x 500 bp, unit-cost global Myers).
"""

import os

import numpy as np
import pytest

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


def _write_prefix(src: str, dst: str, bp: int) -> None:
    with open(src) as f, open(dst, "w") as g:
        for line in f:
            g.write(line[:bp].rstrip("\n") + "\n")


def test_sample_bitpal_96bp_matches_reference_golden(tmp_path):
    """Golden produced by the reference's committed generated BitPAl kernel
    (original/BGSA_AVX2/align_core.c: match 2, mismatch -3, gap -5), compiled
    and run on the 96 bp prefixes of sample-data. Regenerate the fixture
    with the base recipe's avx2 build (.claude/skills/verify/SKILL.md):
    `cut -c1-96` both sample files, `./aligner -q q96 -d s96 -f r -N 1`,
    `./convert -r r -o tests/golden/sample_bitpal_2_m3_m5_96bp.txt`.

    96 bp = 4 x 31-bit words — the minimal-ish multi-word shape that still
    crosses word boundaries; the full 500 bp x 17-word sample costs ~25 s
    *per query* through the XLA scan on the 1-core CPU CI, so it runs only
    under BGSA_FULL_GOLDEN=1 (below). Random-data byte-diffs against the
    same compiled reference run in test_reference_diff either way."""
    from bgsa_tpu.schemes import Scoring

    qp, sp = str(tmp_path / "q96.txt"), str(tmp_path / "s96.txt")
    _write_prefix(os.path.join(REPO, "sample-data", "query.txt"), qp, 96)
    _write_prefix(os.path.join(REPO, "sample-data", "subject.txt"), sp, 96)

    res = str(tmp_path / "r.bin")
    cfg = pl_mod.PipelineConfig(backend="xla")
    stats = pl_mod.run_alignment(
        qp, sp, res, scoring=Scoring(2, -3, -5), config=cfg
    )
    assert (stats.query_count, stats.subject_count) == (3, 128)
    out = str(tmp_path / "conv.txt")
    result_io.convert_result(res, out)
    got = open(out).read()
    want = open(os.path.join(HERE, "golden", "sample_bitpal_2_m3_m5_96bp.txt")).read()
    assert got == want


@pytest.mark.skipif(
    not os.environ.get("BGSA_FULL_GOLDEN"),
    reason="~50 s on 1-core CPU; set BGSA_FULL_GOLDEN=1 (96 bp variant runs by default)",
)
def test_sample_bitpal_full500_matches_reference_golden(tmp_path):
    """The original full-depth golden: first query of the 500 bp sample
    against the committed reference scores (17-word XLA scan)."""
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
