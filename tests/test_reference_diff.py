"""Randomized byte-level differential testing against the compiled reference.

Runs the actual reference binaries (built per .claude/skills/verify/SKILL.md
into /tmp/ref-build) on random datasets and byte-compares complete runs —
result file, .info manifest, and converted text. Skipped when the binaries
are absent (CI without gcc); the golden fixtures in tests/golden cover the
committed cases regardless.
"""

import os
import subprocess

import numpy as np
import pytest

from bgsa_tpu import cli
from bgsa_tpu.io import seqfile

ORIG = "/tmp/ref-build/orig_cpu"
BANDED = "/tmp/ref-build/banded_cpu"
AVX2 = "/tmp/ref-build/avx2"
AVX512 = "/tmp/ref-build/avx512"
# generator instances the reference repo doesn't commit, built by
# tests/ref_kernels/build.sh (semi-global Myers; positive-factor (0,1,1);
# semi-global BitPAl (2,-3,-5))
SEMI = "/tmp/ref-build/semi_cpu"
POS = "/tmp/ref-build/pos_cpu"
SEMIB = "/tmp/ref-build/semib_avx2"


def _have(path):
    return os.path.exists(os.path.join(path, "aligner"))


def _write(path, rng, count, length):
    seqfile.write_seq_file(str(path), rng.integers(0, 4, size=(count, length)))


def _run_ref(build, tmp, qp, sp, extra=()):
    res = str(tmp / "ref.bin")
    conv = str(tmp / "ref.txt")
    subprocess.run([f"{build}/aligner", "-q", qp, "-d", sp, "-f", res, "-N", "1",
                    *extra], check=True, capture_output=True, cwd=str(tmp))
    subprocess.run([f"{build}/convert", "-r", res, "-o", conv],
                   check=True, capture_output=True, cwd=str(tmp))
    return res, conv


def _run_ours(tmp, qp, sp, extra=(), banded=False):
    res = str(tmp / "our.bin")
    conv = str(tmp / "our.txt")
    assert cli.main(["align", "-q", qp, "-d", sp, "-f", res, "--quiet",
                     "--backend", "xla", *extra]) == 0
    conv_args = ["convert", "-r", res, "-o", conv]
    if banded:
        conv_args.append("--banded")
    assert cli.main(conv_args) == 0
    return res, conv


def _compare(ref, ours, bytes_exact=False):
    """Converted text must always match; raw bytes additionally match when
    the subject count is a lane multiple (the scalar reference pads buckets
    to V_NUM=1, we pad to 128 — pad scores differ, converted output does
    not; its own convert reads our files either way)."""
    res_r, conv_r = ref
    res_o, conv_o = ours
    assert open(conv_o).read() == open(conv_r).read()
    if bytes_exact:
        assert open(res_o, "rb").read() == open(res_r, "rb").read()
        assert open(res_o + ".info", "rb").read() == open(res_r + ".info", "rb").read()


@pytest.mark.skipif(not _have(ORIG), reason="reference binaries not built")
@pytest.mark.parametrize("seed", range(3))
def test_diff_myers_vs_reference(tmp_path, seed):
    rng = np.random.default_rng(seed + 5000)
    Q = int(rng.integers(1, 6))
    S = int(rng.integers(1, 700))
    if seed == 0:
        S = 384  # lane multiple: raw result/.info bytes must match too
    m = int(rng.integers(10, 300))
    n = int(rng.integers(10, 300))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    _write(sp, rng, S, n)
    _compare(_run_ref(ORIG, tmp_path, qp, sp), _run_ours(tmp_path, qp, sp),
             bytes_exact=(S % 128 == 0))


@pytest.mark.skipif(not _have(SEMI), reason="semi-global reference not built "
                    "(run tests/ref_kernels/build.sh)")
@pytest.mark.parametrize("seed", range(3))
def test_diff_semiglobal_vs_reference(tmp_path, seed):
    """Semi-global Myers vs the generator's own emission, compiled: the
    reference repo commits no semi-global kernel, so tests/ref_kernels holds
    a hand-instantiation of MyersGenerator.genSemiGlobal for the CPU arch."""
    rng = np.random.default_rng(seed + 8000)
    Q = int(rng.integers(1, 6))
    S = 384 if seed == 0 else int(rng.integers(1, 700))
    m = int(rng.integers(10, 300))
    n = int(rng.integers(10, 300))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    _write(sp, rng, S, n)
    _compare(
        _run_ref(SEMI, tmp_path, qp, sp),
        _run_ours(tmp_path, qp, sp, extra=["--semi-global"]),
        bytes_exact=(S % 128 == 0),
    )


@pytest.mark.skipif(not _have(POS), reason="positive-factor reference not "
                    "built (run tests/ref_kernels/build.sh)")
@pytest.mark.parametrize("seed", range(2))
def test_diff_positive_factor_vs_reference(tmp_path, seed):
    """(0, 1, 1) — the generator's factor=+1 normalization (Main.java:
    253-257) — vs the committed kernel rebuilt with factor = 1."""
    rng = np.random.default_rng(seed + 9000)
    Q = int(rng.integers(1, 5))
    S = 256 if seed == 0 else int(rng.integers(1, 700))
    m = int(rng.integers(10, 250))
    n = int(rng.integers(10, 250))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    _write(sp, rng, S, n)
    _compare(
        _run_ref(POS, tmp_path, qp, sp),
        _run_ours(tmp_path, qp, sp, extra=["-M", "0", "-I", "1", "-G", "1"]),
        bytes_exact=(S % 128 == 0),
    )


@pytest.mark.skipif(not _have(ORIG), reason="reference binaries not built")
def test_converters_cross_read_each_others_files(tmp_path):
    """Interop both directions: our convert on a reference-written result
    pair, and the reference's convert on ours, emit identical text."""
    rng = np.random.default_rng(31337)
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, 3, 40)
    _write(sp, rng, 300, 44)
    res_r, conv_r = _run_ref(ORIG, tmp_path, qp, sp)
    res_o, conv_o = _run_ours(tmp_path, qp, sp)
    ours_on_ref = str(tmp_path / "ours_on_ref.txt")
    assert cli.main(["convert", "-r", res_r, "-o", ours_on_ref]) == 0
    assert open(ours_on_ref).read() == open(conv_r).read()
    ref_on_ours = str(tmp_path / "ref_on_ours.txt")
    subprocess.run([f"{ORIG}/convert", "-r", res_o, "-o", ref_on_ours],
                   check=True, capture_output=True, cwd=str(tmp_path))
    assert open(ref_on_ours).read() == open(conv_o).read()


@pytest.mark.skipif(not _have(ORIG), reason="reference binaries not built")
def test_diff_query_bucket_boundary_vs_reference(tmp_path):
    """130 queries cross the reference's compiled-in REF_BUCKET_COUNT=100
    (original/BGSA_CPU/config.h): the result file blocks per (subject bucket,
    query bucket), so the 100/30 split must land byte-identically — every
    other differential draws Q <= 5 and would never catch a query-bucket
    blocking divergence. S=384 is a lane multiple, so raw result/.info
    bytes match too, and the reference's own convert must read our pair."""
    rng = np.random.default_rng(424242)
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, 130, 40)
    _write(sp, rng, 384, 50)
    ref = _run_ref(ORIG, tmp_path, qp, sp)
    ours = _run_ours(tmp_path, qp, sp)
    _compare(ref, ours, bytes_exact=True)
    ref_on_ours = str(tmp_path / "ref_on_ours.txt")
    subprocess.run([f"{ORIG}/convert", "-r", ours[0], "-o", ref_on_ours],
                   check=True, capture_output=True, cwd=str(tmp_path))
    assert open(ref_on_ours).read() == open(ref[1]).read()
    # Multi-DB-bucket x multi-query-bucket double loop: a small --bucket-size
    # re-blocks the result file (converted text is layout-independent, and
    # the reference's 115 MB READ_BUCKET_SIZE can't be re-compiled down).
    res2 = str(tmp_path / "our2.bin")
    conv2 = str(tmp_path / "our2.txt")
    assert cli.main(["align", "-q", qp, "-d", sp, "-f", res2, "--quiet",
                     "--backend", "xla", "--bucket-size", "6528"]) == 0
    assert cli.main(["convert", "-r", res2, "-o", conv2]) == 0
    assert open(conv2).read() == open(ref[1]).read()


@pytest.mark.skipif(not _have(ORIG), reason="reference binaries not built")
def test_diff_length_one_sequences(tmp_path):
    """Degenerate geometry: 1 bp queries and subjects, every family/mode
    that has a compiled target — byte-identical converted output."""
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    open(qp, "w").write("A\nC\n")
    open(sp, "w").write("A\nG\nT\nC\n")
    cases = [(ORIG, [], False)]
    if _have(AVX2):
        cases.append((AVX2, ["-M", "2", "-I", "-3", "-G", "-5"], False))
    if _have(SEMI):
        cases.append((SEMI, ["--semi-global"], False))
    for build, extra, banded in cases:
        _compare(_run_ref(build, tmp_path, qp, sp),
                 _run_ours(tmp_path, qp, sp, extra=extra, banded=banded))


@pytest.mark.skipif(not _have(SEMIB), reason="semi-global BitPAl reference "
                    "not built (run tests/ref_kernels/build.sh)")
@pytest.mark.parametrize("seed,packed", [(0, True), (1, False)])
def test_diff_bitpal_semiglobal_vs_reference(tmp_path, seed, packed):
    """Semi-global BitPAl (2,-3,-5) — both representations — vs the committed
    AVX2 kernel with the generator's isSemiGlobal differences applied at
    build time."""
    rng = np.random.default_rng(seed + 9500)
    Q = int(rng.integers(1, 4))
    S = int(rng.integers(1, 500))
    m = int(rng.integers(10, 150))
    n = int(rng.integers(10, 150))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    _write(sp, rng, S, n)
    extra = ["-M", "2", "-I", "-3", "-G", "-5", "--semi-global"]
    if not packed:
        extra.append("--no-packed")
    _compare(_run_ref(SEMIB, tmp_path, qp, sp), _run_ours(tmp_path, qp, sp, extra=extra))


@pytest.mark.skipif(not _have(BANDED), reason="reference binaries not built")
@pytest.mark.parametrize("seed,k", [(0, 4), (1, 8), (2, 12)])
def test_diff_banded_vs_reference(tmp_path, seed, k):
    rng = np.random.default_rng(seed + 6000)
    Q = int(rng.integers(1, 4))
    S = int(rng.integers(1, 700))
    # Stay in the reference's well-defined region: qlen >= 64 + k,
    # qlen <= slen, band_length = 2k + (slen - qlen) + 1 <= 64, and the
    # packer word-capacity bound ceil(slen/64) <= ceil((qlen-k)/64) — its
    # word_num is ceil((read_len-h)/64)+1 (cal_cpu.c:254) while the packer
    # writes ceil(slen/64) injection words, overrunning into the next
    # character plane's preload otherwise (PARITY.md divergence #1; the
    # intended 150bp/500bp workloads satisfy the bound).
    while True:
        m = int(rng.integers(64 + k, 250))
        cap = 64 * ((m - k + 63) // 64)
        if cap >= m:
            break
    n = int(rng.integers(m, min(m + 64 - 2 * k, cap + 1)))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    q = seqfile.read_queries(qp)
    s = rng.integers(0, 4, size=(S, n))
    s[: max(S // 4, 1), :m] = q[0]  # near-hits so not everything early-exits
    seqfile.write_seq_file(sp, s)
    _compare(
        _run_ref(BANDED, tmp_path, qp, sp, extra=["-k", str(k)]),
        _run_ours(tmp_path, qp, sp, extra=["-k", str(k)], banded=True),
    )


@pytest.mark.parametrize("build", [AVX2, AVX512])
@pytest.mark.parametrize("seed", range(2))
def test_diff_bitpal_vs_reference(tmp_path, seed, build):
    # the AVX2/AVX512 ports' committed kernels are BitPAl (2,-3,-5) —
    # two independent reference implementations of the same math
    if not _have(build):
        pytest.skip("reference binaries not built")
    rng = np.random.default_rng(seed + 7000)
    Q = int(rng.integers(1, 4))
    S = int(rng.integers(1, 600))
    # short lengths: the XLA-scan BitPAl costs ~0.3 s/column on the 1-core
    # CI; 500 bp x multi-word coverage comes from the committed golden
    m = int(rng.integers(10, 120))
    n = int(rng.integers(10, 120))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    _write(qp, rng, Q, m)
    _write(sp, rng, S, n)
    _compare(
        _run_ref(build, tmp_path, qp, sp),
        _run_ours(tmp_path, qp, sp, extra=["-M", "2", "-I", "-3", "-G", "-5"]),
    )
    if seed == 0:
        # the 32-bit compare-carry variant (KNC hw-adc analogue) must also
        # byte-diff clean against the compiled reference; small fixed shapes
        # that still cross the 32-bit word boundary (n=45 -> 2 full words)
        qp2, sp2 = str(tmp_path / "q2.txt"), str(tmp_path / "s2.txt")
        _write(qp2, rng, 2, 40)
        _write(sp2, rng, 256, 45)
        _compare(
            _run_ref(build, tmp_path, qp2, sp2),
            _run_ours(tmp_path, qp2, sp2,
                      extra=["-M", "2", "-I", "-3", "-G", "-5", "--carry"]),
        )
