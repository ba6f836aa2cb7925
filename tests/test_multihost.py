import os
import subprocess

import jax
import numpy as np
import pytest

from bgsa_tpu import pipeline as pl_mod
from bgsa_tpu.io import result as result_io
from bgsa_tpu.io import seqfile
from bgsa_tpu.parallel import multihost
from bgsa_tpu.schemes import Mode, Scoring


def test_split_counts():
    assert multihost.split_counts(1024, 2, 128) == [512, 512]
    assert multihost.split_counts(1280, 3, 128) == [384, 384, 512]
    assert sum(multihost.split_counts(640, 4, 128)) == 640
    # ratio-weighted (heterogeneous hosts)
    got = multihost.split_counts(1280, 2, 128, ratios=[1, 3])
    assert got == [256, 1024]


def test_multihost_roles_merge_equals_single(tmp_path, rng):
    Q, m, S, n = 5, 30, 700, 40
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    cfg = pl_mod.PipelineConfig(
        backend="xla", bucket_size=256 * (n + 1), ref_bucket_count=3, local_shards=1
    )
    # single-host reference run
    single = str(tmp_path / "single.bin")
    pl_mod.run_alignment(qp, sp, single, config=cfg)
    conv_single = str(tmp_path / "single.txt")
    result_io.convert_result(single, conv_single, ref_bucket_count=3)

    # two host roles, sequential, then merge
    shard_paths, metas = [], []
    for h in range(2):
        p = str(tmp_path / f"shard{h}.bin")
        stats, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(h, 2))
        shard_paths.append(p)
        metas.append(meta)
    merged = str(tmp_path / "merged.bin")
    multihost.merge_shards(merged, shard_paths, metas, ref_bucket_count=3)

    info = result_io.read_info(merged + ".info")
    assert info.device_num == 2
    conv_merged = str(tmp_path / "merged.txt")
    result_io.convert_result(merged, conv_merged, ref_bucket_count=3)
    assert open(conv_merged).read() == open(conv_single).read()


def test_extreme_ratios_minimal_last_host_slice(tmp_path, rng):
    """Ratios skewed ~1e9:1 — the reachable extreme. split_counts floors
    every earlier host to a lane multiple, so the last host always inherits
    at least one lane (a zero-row last slice is arithmetically impossible
    with positive weights); here its slice is exactly one 128-lane group,
    more than half 'N' pads, and merge + convert still match single-host."""
    Q, m, S, n = 3, 20, 700, 24  # S % 128 != 0 -> final bucket has pads
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=512 * (n + 1))
    single = str(tmp_path / "single.bin")
    pl_mod.run_alignment(qp, sp, single, config=cfg)
    conv_single = str(tmp_path / "single.txt")
    result_io.convert_result(single, conv_single)

    ratios = [1e9, 1.0]
    shard_paths, metas = [], []
    for h in range(2):
        p = str(tmp_path / f"shard{h}.bin")
        _, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(h, 2),
                                       shard_ratios=ratios)
        shard_paths.append(p)
        metas.append(meta)
    assert metas[1].block_counts == [128, 128]  # one lane group per bucket
    assert metas[1].extra_counts[-1] == 256 - (700 - 512)  # 68 pads, > half

    merged = str(tmp_path / "merged.bin")
    multihost.merge_shards(merged, shard_paths, metas)
    conv_merged = str(tmp_path / "merged.txt")
    result_io.convert_result(merged, conv_merged)
    assert open(conv_merged).read() == open(conv_single).read()


def test_local_shards_engine(tmp_path, rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    Q, m, S, n = 3, 25, 1024, 30
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    res1 = str(tmp_path / "r1.bin")
    res4 = str(tmp_path / "r4.bin")
    pl_mod.run_alignment(qp, sp, res1, config=pl_mod.PipelineConfig(backend="xla", local_shards=1))
    pl_mod.run_alignment(qp, sp, res4, config=pl_mod.PipelineConfig(backend="xla", local_shards=4))
    a = open(res1, "rb").read()
    b = open(res4, "rb").read()
    assert a == b


def test_dynamic_balancer_matches_reference_trace():
    """Bit-exact against ``adjust_device_ratio3``: the fixture holds ratio
    traces produced by a compiled harness around the verbatim reference
    function (``original/BGSA_KNC/global.c:120-168``) with the driver's
    allocation semantics (zero history, ``time_index++`` per call —
    ``cal_all.c:971-980,1312,1332``). Float64 op order matches, so equality
    is exact, not approximate."""
    import json
    import os

    fix = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "golden", "balancer_trace.json")))
    assert {c["n_devices"] for c in fix} == {2, 3, 4}
    for case in fix:
        bal = multihost.DynamicBalancer(case["n_devices"])
        for times, want in zip(case["times"], case["ratios"]):
            assert bal.update(times) == want


def test_dynamic_balancer_matches_live_harness(rng):
    """Differential vs the *freshly compiled* reference balancer on random
    times (the committed fixture is itself regenerated by this harness —
    tests/ref_kernels/{balancer_harness.c,regen_balancer_trace.py})."""
    import os
    import subprocess

    harness = "/tmp/ref-build/balancer/balancer_harness"
    if not os.path.exists(harness):
        build = os.path.join(os.path.dirname(__file__), "ref_kernels", "build.sh")
        try:
            subprocess.run(["sh", build, "/tmp/ref-build", "balancer"],
                           check=True, capture_output=True, timeout=60)
        except Exception as e:
            pytest.skip(f"cannot build balancer harness: {e}")
    for n in (2, 3, 5):
        times = rng.uniform(0.5, 10.0, size=(7, n))
        feed = [f"{n} {len(times)}"] + [
            " ".join(f"{t:.17g}" for t in row) for row in times
        ]
        out = subprocess.run([harness], input="\n".join(feed) + "\n",
                             capture_output=True, text=True, check=True)
        want = [[float(tok) for tok in line.split()]
                for line in out.stdout.splitlines()]
        bal = multihost.DynamicBalancer(n)
        for row, w in zip(times, want):
            assert bal.update(list(row)) == w  # float64 bit-exact


def test_dynamic_balancer_converges():
    # host 1 is 3x faster than host 0: ratios should approach [1, 3]
    bal = multihost.DynamicBalancer(2)
    for _ in range(12):
        r = bal.ratios
        counts = multihost.split_counts(12800, 2, 128, r)
        times = [counts[0] / 1.0, counts[1] / 3.0]
        bal.update(times)
    assert 2.5 < bal.ratios[1] < 3.5
    counts = multihost.split_counts(12800, 2, 128, bal.ratios)
    assert abs(counts[1] / counts[0] - 3.0) < 0.5


def test_banded_multihost_roles_merge_equals_single(tmp_path, rng):
    from bgsa_tpu.banded_pipeline import run_banded

    Q, m, S, n = 4, 64, 700, 70
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    s[:40, :m] = q[0]  # some passing reads
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1), ref_bucket_count=3)
    single = str(tmp_path / "single.bin")
    run_banded(qp, sp, single, 8, cfg)
    conv_single = str(tmp_path / "single.txt")
    result_io.convert_result(single, conv_single, write_dtype=np.int8, ref_bucket_count=3)

    shard_paths, metas = [], []
    for h in range(2):
        p = str(tmp_path / f"shard{h}.bin")
        stats, meta = run_banded(qp, sp, p, 8, cfg, shard=(h, 2))
        shard_paths.append(p)
        metas.append(meta)
    merged = str(tmp_path / "merged.bin")
    multihost.merge_shards(merged, shard_paths, metas, write_dtype=np.int8, ref_bucket_count=3)
    conv_merged = str(tmp_path / "merged.txt")
    result_io.convert_result(merged, conv_merged, write_dtype=np.int8, ref_bucket_count=3)
    assert open(conv_merged).read() == open(conv_single).read()


def test_cli_host_roles_and_merge(tmp_path, rng):
    from bgsa_tpu import cli

    Q, m, S, n = 3, 30, 600, 40
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    single = str(tmp_path / "single.bin")
    assert cli.main(["align", "-q", qp, "-d", sp, "-f", single, "--backend", "xla",
                     "--quiet"]) == 0

    # heterogeneous ratio file (reference -R format)
    rfile = str(tmp_path / "ratios.txt")
    open(rfile, "w").write("1.0 3.0\n")
    shards = []
    for h in range(2):
        sh = str(tmp_path / f"sh{h}.bin")
        assert cli.main(["align", "-q", qp, "-d", sp, "-f", sh, "--backend", "xla",
                         "--quiet", "--host", f"{h}:2", "-R", rfile]) == 0
        shards.append(sh)
    merged = str(tmp_path / "merged.bin")
    assert cli.main(["merge", *shards, "-o", merged]) == 0

    conv_a = str(tmp_path / "a.txt")
    conv_b = str(tmp_path / "b.txt")
    result_io.convert_result(single, conv_a)
    result_io.convert_result(merged, conv_b)
    assert open(conv_a).read() == open(conv_b).read()


def test_shard_resume_after_interruption(tmp_path, rng):
    """--host role resume: a truncated shard file continues where it left off
    instead of being silently destroyed (regression)."""
    Q, m, S, n = 4, 30, 1500, 40
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))

    full = str(tmp_path / "full.bin")
    pl_mod.run_alignment(qp, sp, full, config=cfg, shard=(0, 2))
    want = open(full, "rb").read()

    # simulate a crash: keep 1.5 buckets' worth of bytes, plus the
    # incrementally-saved sidecar recording the split actually used
    db = seqfile.DatabaseReader(sp, cfg.bucket_size, cfg.v_num)
    counts = db.bucket_counts()
    first_count = multihost.host_slice(counts[0][0], 2, 0, cfg.v_num)[1]
    keep = first_count * Q * 2 + 100  # bucket 0 complete + partial bucket 1
    part = str(tmp_path / "part.bin")
    open(part, "wb").write(want[:keep])
    import shutil

    shutil.copy(full + ".meta.json", part + ".meta.json")

    stats, meta = pl_mod.run_alignment(qp, sp, part, config=cfg, shard=(0, 2), resume=True)
    assert open(part, "rb").read() == want
    assert len(meta.block_counts) == len(counts)


def test_shard_resume_refuses_without_sidecar(tmp_path, rng):
    """Resuming a shard whose split record is gone must refuse, not guess
    offsets and append misaligned data."""
    q = rng.integers(0, 4, size=(2, 20))
    s = rng.integers(0, 4, size=(600, 20))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * 21)
    part = str(tmp_path / "part.bin")
    open(part, "wb").write(b"\0" * 100)  # orphan shard, no .meta.json
    with pytest.raises(ValueError, match="meta.json is missing"):
        pl_mod.run_alignment(qp, sp, part, config=cfg, shard=(0, 2), resume=True)


def test_merge_infers_dtype_from_sidecar(tmp_path, rng):
    """Banded (int8) shards merge correctly without the --banded flag: the
    sidecar records the dtype (regression: itemsize used to come solely from
    the flag, silently corrupting the merged file)."""
    from bgsa_tpu import cli
    from bgsa_tpu.banded_pipeline import run_banded

    Q, m, S, n = 3, 40, 500, 44
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    s[:30, :m] = q[0]
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))

    single = str(tmp_path / "single.bin")
    run_banded(qp, sp, single, 6, cfg)
    shards = []
    for h in range(2):
        sh = str(tmp_path / f"sh{h}.bin")
        _, meta = run_banded(qp, sp, sh, 6, cfg, shard=(h, 2))
        assert meta.dtype == "int8"
        meta.save(sh + ".meta.json")
        shards.append(sh)
    merged = str(tmp_path / "merged.bin")
    assert cli.main(["merge", *shards, "-o", merged]) == 0  # no --banded
    conv_a, conv_b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    result_io.convert_result(single, conv_a, write_dtype=np.int8)
    result_io.convert_result(merged, conv_b, write_dtype=np.int8)
    assert open(conv_a).read() == open(conv_b).read()


def test_merge_rejects_size_mismatch(tmp_path):
    """A shard whose byte size disagrees with its sidecar (wrong dtype or
    truncation) is rejected instead of silently merged."""
    metas = [multihost.ShardMeta(h, 2, 5, [128], [0], dtype="int16") for h in range(2)]
    paths = []
    for h, meta in enumerate(metas):
        p = str(tmp_path / f"s{h}.bin")
        # int8-sized payload under an int16 meta: half the expected bytes
        open(p, "wb").write(b"\0" * (128 * 5 * (1 if h else 2)))
        meta.save(p + ".meta.json")
        paths.append(p)
    with pytest.raises(ValueError, match="wrong dtype or truncated"):
        multihost.merge_shards(str(tmp_path / "m.bin"), paths, metas)


def test_cli_rejects_ratio_without_host(tmp_path, rng):
    from bgsa_tpu import cli

    q = rng.integers(0, 4, size=(2, 20))
    s = rng.integers(0, 4, size=(200, 20))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    rfile = str(tmp_path / "r.txt")
    open(rfile, "w").write("1 2\n")
    rc = cli.main(["align", "-q", qp, "-d", sp, "-f", str(tmp_path / "o.bin"),
                   "-R", rfile, "--quiet"])
    assert rc == 1


def test_merge_rejects_mismatched_shards(tmp_path):
    import pytest

    from bgsa_tpu import cli

    a = multihost.ShardMeta(0, 2, 5, [128], [0])
    b = multihost.ShardMeta(1, 2, 7, [128], [0])  # different ref_count
    for name, meta in (("a.bin", a), ("b.bin", b)):
        p = str(tmp_path / name)
        open(p, "wb").write(b"\0" * 10)
        meta.save(p + ".meta.json")
    with pytest.raises(SystemExit):
        cli.main(["merge", str(tmp_path / "a.bin"), str(tmp_path / "b.bin"),
                  "-o", str(tmp_path / "m.bin")])


def test_merge_rejects_duplicate_and_unpaired_shards(tmp_path):
    """Library-level identity validation: duplicated host ids and
    path/meta length mismatches raise instead of silently corrupting."""
    metas = [multihost.ShardMeta(0, 2, 5, [128], [0], dtype="int16")
             for _ in range(2)]  # both claim host 0
    paths = []
    for i, meta in enumerate(metas):
        p = str(tmp_path / f"d{i}.bin")
        open(p, "wb").write(b"\0" * (128 * 5 * 2))
        meta.save(p + ".meta.json")
        paths.append(p)
    with pytest.raises(ValueError, match="hosts 0..1"):
        multihost.merge_shards(str(tmp_path / "m.bin"), paths, metas)
    with pytest.raises(ValueError, match="shard paths but"):
        multihost.merge_shards(str(tmp_path / "m.bin"), paths[:1], metas)
    # out-of-order paths merge correctly (pairs are co-sorted)
    good = [multihost.ShardMeta(h, 2, 1, [128], [0], dtype="int16")
            for h in range(2)]
    gp = []
    for h, meta in enumerate(good):
        p = str(tmp_path / f"g{h}.bin")
        np.full(128, h, np.int16).tofile(p)
        meta.save(p + ".meta.json")
        gp.append(p)
    out = str(tmp_path / "g.bin")
    multihost.merge_shards(out, [gp[1], gp[0]], [good[1], good[0]])
    merged = np.fromfile(out, np.int16)
    assert (merged[:128] == 0).all() and (merged[128:] == 1).all()


def test_zero_count_middle_host_slice(tmp_path, rng):
    """A middle host can inherit a zero-subject slice (extreme -R ratios
    floor its share to no lane groups — here host 1 contributes nothing at
    all, and host 0's tail-bucket slice is empty too). The shard file is
    legitimately empty, the sidecar records the zero counts, and merge +
    convert still reproduce the single-host output byte-for-byte."""
    Q, m, S, n = 3, 20, 700, 24
    q = rng.integers(0, 4, size=(Q, m))
    s = rng.integers(0, 4, size=(S, n))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)

    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=512 * (n + 1))
    single = str(tmp_path / "single.bin")
    pl_mod.run_alignment(qp, sp, single, config=cfg)
    conv_single = str(tmp_path / "single.txt")
    result_io.convert_result(single, conv_single)

    ratios = [1e9, 1.0, 1e9]
    shard_paths, metas = [], []
    for h in range(3):
        p = str(tmp_path / f"shard{h}.bin")
        _, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(h, 3),
                                       shard_ratios=ratios)
        shard_paths.append(p)
        metas.append(meta)
    assert metas[1].block_counts == [0, 0]  # middle host floored to nothing
    assert os.path.getsize(shard_paths[1]) == 0

    merged = str(tmp_path / "merged.bin")
    multihost.merge_shards(merged, shard_paths, metas)
    conv_merged = str(tmp_path / "merged.txt")
    result_io.convert_result(merged, conv_merged)
    assert open(conv_merged).read() == open(conv_single).read()


def test_resume_refuses_changed_ratios(tmp_path, rng):
    """Resuming a static --host role under different -R ratios would slice
    every remaining bucket differently than the peers computed — the shard
    sidecar records the normalized split and the resume refuses."""
    Q, m, S, n = 2, 16, 900, 20
    seqfile.write_seq_file(str(tmp_path / "q.txt"), rng.integers(0, 4, size=(Q, m)))
    seqfile.write_seq_file(str(tmp_path / "s.txt"), rng.integers(0, 4, size=(S, n)))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    cfg = pl_mod.PipelineConfig(backend="xla", bucket_size=256 * (n + 1))
    p = str(tmp_path / "sh0.bin")
    pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2),
                         shard_ratios=[1.0, 2.0])[1].save(p + ".meta.json")

    with pytest.raises(ValueError, match="split ratios"):
        pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2),
                             resume=True)  # ratios forgotten -> even split
    with pytest.raises(ValueError, match="split ratios"):
        pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2),
                             shard_ratios=[2.0, 1.0], resume=True)

    # same ratios (any scaling) resume fine
    _, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2),
                                   shard_ratios=[10.0, 20.0], resume=True)
    assert meta.ratios == [1.0 / 3.0, 2.0 / 3.0]


def test_merge_refuses_mixed_databases(tmp_path, rng):
    """Shards of two different databases can agree on every per-shard count;
    the sidecar's run geometry (db subject count) must catch the mix."""
    Q, m, n = 2, 16, 20
    qp = str(tmp_path / "q.txt")
    seqfile.write_seq_file(qp, rng.integers(0, 4, size=(Q, m)))
    cfg = pl_mod.PipelineConfig(backend="xla")
    paths, metas = [], []
    for h, S in ((0, 500), (1, 600)):  # different databases
        sp = str(tmp_path / f"s{h}.txt")
        seqfile.write_seq_file(sp, rng.integers(0, 4, size=(S, n)))
        p = str(tmp_path / f"sh{h}.bin")
        _, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(h, 2))
        paths.append(p)
        metas.append(meta)
    with pytest.raises(ValueError, match="database subject count"):
        multihost.merge_shards(str(tmp_path / "m.bin"), paths, metas)


def test_shard_resume_fresh_and_missing_sidecar(tmp_path, rng):
    """shard_resume_point edges: --resume on a role that never ran starts
    fresh (0, None); a shard file without its sidecar refuses rather than
    guessing the split."""
    Q, m, S, n = 2, 16, 300, 20
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, rng.integers(0, 4, size=(Q, m)))
    seqfile.write_seq_file(sp, rng.integers(0, 4, size=(S, n)))
    cfg = pl_mod.PipelineConfig(backend="xla")
    p = str(tmp_path / "sh0.bin")

    # resume with no prior shard: plain fresh run
    _, meta = pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2),
                                   resume=True)
    assert sum(meta.block_counts) > 0

    # shard exists, sidecar gone: refuse (the split is unknowable)
    import os

    os.unlink(p + ".meta.json")
    with pytest.raises(ValueError, match="sidecar .* is missing"):
        pl_mod.run_alignment(qp, sp, p, config=cfg, shard=(0, 2), resume=True)
