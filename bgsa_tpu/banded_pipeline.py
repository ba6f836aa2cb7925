"""Banded-Myers pipeline: the read-verification filter workload.

Same bucketed structure as pipeline.run_alignment but with the banded packing
(initial 64-bit Peq window + injection stream) and int8 result records
(MAX_ERROR=127 sentinel), matching the reference banded ports'
``common_write_t int8_t`` (``banded/BGSA_CPU/config.h``).
"""

from __future__ import annotations

import functools
import queue
import threading
import time

import numpy as np

from . import pack
from .io import result as result_io
from .io import seqfile
from .pipeline import PipelineConfig, _enable_compilation_cache
from .stats import RunStats


class BandedEngine:
    def __init__(self, threshold: int, config: PipelineConfig):
        import jax

        self._jax = jax
        _enable_compilation_cache(jax)
        self.k = threshold
        self.config = config
        backend = config.backend
        if backend == "auto":
            try:
                on_tpu = jax.default_backend() == "tpu"
            except RuntimeError:
                on_tpu = False
            backend = "pallas" if on_tpu or config.interpret else "xla"
        self.backend = backend
        self._step = functools.lru_cache(maxsize=None)(self._build_step)

    def _build_step(self, q_len: int, s_len: int):
        jax, config, k = self._jax, self.config, self.k
        import jax.numpy as jnp

        from .ops import banded as banded_ops

        @jax.jit
        def step(qcodes, snib):
            # Subjects travel nibble-packed; banded packing runs on the VPU
            # (the reference burns host cores in its banded handle_reads).
            scodes = pack.nibble_unpack_jax(snib, s_len)
            init_lo, init_hi, inj = pack.pack_banded_jax(scodes, k, q_len)
            if self.backend == "pallas":
                kw2 = dict(q_len=q_len, s_len=s_len, k=k, interpret=config.interpret)
                if config.rows_per_block:
                    kw2["rows_per_block"] = config.rows_per_block
                s = banded_ops.banded(init_lo, init_hi, inj, qcodes, **kw2)
            else:
                s = banded_ops.banded_xla(
                    init_lo, init_hi, inj, qcodes, q_len=q_len, s_len=s_len, k=k
                )
            return s.astype(jnp.int8)

        return step

    def scores(self, query_codes: np.ndarray, packed):
        snib, s_len = packed
        step = self._step(query_codes.shape[1], s_len)
        return step(query_codes.astype(np.int32), snib)

    def pack(self, subject_codes: np.ndarray, q_len: int):
        return pack.nibble_pack(subject_codes), subject_codes.shape[1]


def run_banded(
    query_path: str,
    db_path: str,
    result_path: str,
    threshold: int,
    config: PipelineConfig = PipelineConfig(),
    shard: tuple[int, int] | None = None,
    shard_ratios=None,
    resume: bool = False,
):
    """Banded filter run; same multi-host/resume surface as run_alignment.

    With ``shard=(host_id, n_hosts)`` writes this host's raw shard file and
    returns (stats, ShardMeta) for parallel.multihost.merge_shards.
    """
    engine = BandedEngine(threshold, config)
    stats = RunStats()
    t_start = time.perf_counter()

    queries = seqfile.read_queries(query_path)
    db = seqfile.DatabaseReader(db_path, config.bucket_size, config.v_num)
    stats.query_count, stats.query_len = queries.shape
    stats.subject_len = db.length

    q_buckets = [
        queries[s : s + config.ref_bucket_count]
        for s in range(0, len(queries), config.ref_bucket_count)
    ]

    # One compiled step per run: pad tail buckets to the full-bucket shape
    # (see pipeline.run_alignment — compile time dwarfs compute otherwise).
    pad_to = db.seqs_per_bucket if db.bucket_count > 1 else 0

    meta = None
    done_buckets = 0
    if shard is not None:
        from .parallel.multihost import ShardMeta, host_slice

        host_id, n_hosts = shard
        writer_fp = open(result_path, "wb")
        meta = ShardMeta(host_id, n_hosts, len(queries), [], [])
        if pad_to:
            pad_to = host_slice(pad_to, n_hosts, host_id, config.v_num, shard_ratios)[1]
    else:
        if resume:
            done_buckets = result_io.resume_point(
                result_path, len(queries), write_dtype=np.int8
            )
        writer = result_io.ResultWriter(
            result_path, ref_count=len(queries), block_num=db.bucket_count,
            device_num=1, write_dtype=np.int8, append=done_buckets > 0,
        )

    if pad_to:
        t0 = time.perf_counter()
        dummy = engine.pack(np.full((pad_to, db.length), 4, np.uint8), stats.query_len)
        for nq in sorted({qb.shape[0] for qb in q_buckets}):
            engine.scores(queries[:nq], dummy).block_until_ready()
        stats.compile_time = time.perf_counter() - t0

    buckets: queue.Queue = queue.Queue(maxsize=config.prefetch)

    def read_all():
        for bucket in db:
            buckets.put(bucket)
        buckets.put(None)

    threading.Thread(target=read_all, daemon=True).start()

    bucket_index = -1
    while True:
        bucket = buckets.get()
        if bucket is None:
            break
        bucket_index += 1
        if bucket_index < done_buckets:
            continue
        codes = bucket.codes
        if shard is not None:
            from .parallel.multihost import host_slice

            start, count = host_slice(
                bucket.count, n_hosts, host_id, config.v_num, shard_ratios
            )
            codes = codes[start : start + count]
            meta.block_counts.append(count)
            meta.extra_counts.append(
                bucket.extra_count if host_id == n_hosts - 1 else 0
            )
            stats.subject_count += count - meta.extra_counts[-1]
        else:
            writer.start_bucket([bucket.count], bucket.extra_count)
            stats.subject_count += bucket.count - bucket.extra_count
        if codes.shape[0] == 0:
            continue
        real = codes.shape[0]
        if real < pad_to:
            pad = np.full((pad_to - real, codes.shape[1]), 4, codes.dtype)
            codes = np.concatenate([codes, pad])
        t0 = time.perf_counter()
        packed = engine.pack(codes, stats.query_len)
        stats.pack_time += time.perf_counter() - t0
        for qb in q_buckets:
            t0 = time.perf_counter()
            host_scores = np.asarray(engine.scores(qb, packed))[:, :real]
            stats.cal_time += time.perf_counter() - t0
            t0 = time.perf_counter()
            if shard is not None:
                writer_fp.write(host_scores.tobytes())
            else:
                writer.write_scores(host_scores)
            stats.write_time += time.perf_counter() - t0

    if shard is not None:
        writer_fp.close()
        stats.total_time = time.perf_counter() - t_start
        return stats, meta
    writer.close()
    stats.total_time = time.perf_counter() - t_start
    return stats
