"""Batch alignment pipeline: read -> pack -> kernel -> result file.

TPU-native replacement for the reference's 3-stage pthread pipeline
(``/root/reference/original/BGSA_CPU/cal_cpu.c:121-476`` + ``thread.c``):

* the condvar/A-B double-buffer handshake becomes a bounded prefetch queue
  (reader thread) plus JAX's async dispatch — the device computes bucket k
  while the host reads and uploads bucket k+1;
* bit-packing happens on-device inside the jitted step (the reference burns
  host cores in ``*_handle_reads``; we ship raw symbol codes and let the VPU
  pack);
* the OpenMP (query x chunk) tiling is the Pallas grid.

Output is written in the reference's exact blocked order via io.result.
"""

from __future__ import annotations

import dataclasses
import functools
import queue
import threading
import time

import numpy as np

from . import pack
from .io import result as result_io
from .io import seqfile
from .schemes import Algorithm, Mode, NormalizedScheme, Scoring, normalize
from .stats import RunStats


def _enable_compilation_cache(jax) -> None:
    """Persist compiled kernels across processes (compile dominates small runs).

    Opt-in via BGSA_COMPILE_CACHE=1: on remote-compile TPU setups the
    persistent cache can serialize against the compile service and slow runs
    down instead of speeding them up (measured 21s -> 4m46s on axon).
    """
    import os

    if not os.environ.get("BGSA_COMPILE_CACHE"):
        return
    try:
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "bgsa_tpu", "jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is best-effort


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    bucket_size: int = seqfile.DEFAULT_BUCKET_SIZE
    ref_bucket_count: int = seqfile.REF_BUCKET_COUNT
    v_num: int = 128  # subject pad unit; must be a multiple of 128 for Pallas
    rows_per_block: int = 128
    backend: str = "auto"  # "pallas" | "xla" | "auto"
    interpret: bool = False  # Pallas interpreter mode (tests)
    prefetch: int = 2


class Engine:
    """Compiled scoring step for one normalized scheme."""

    def __init__(self, scheme: NormalizedScheme, config: PipelineConfig):
        self.scheme = scheme
        self.config = config
        import jax

        self._jax = jax
        _enable_compilation_cache(jax)
        backend = config.backend
        if backend == "auto":
            try:
                on_tpu = jax.default_backend() == "tpu"
            except RuntimeError:
                on_tpu = False
            backend = "pallas" if on_tpu or config.interpret else "xla"
        self.backend = backend
        self._step = functools.lru_cache(maxsize=None)(self._build_step)

    @property
    def word_bits(self) -> int:
        # Global Myers reserves the top bit for the in-word add carry; the
        # semi-global block formulation threads deltas between words and uses
        # full words (the reference's full_bits flag, GeneratorUtils.java:66-70).
        if self.scheme.algorithm is Algorithm.MYERS and self.scheme.mode is Mode.SEMI_GLOBAL:
            return 32
        return 31

    def _build_step(self, q_len: int, s_len: int):
        jax, config, scheme = self._jax, self.config, self.scheme
        import jax.numpy as jnp

        word_bits = self.word_bits

        def kernel(eq, qcodes):
            if scheme.algorithm is Algorithm.BITPAL:
                from .ops import bitpal

                kw = dict(
                    match=scheme.match, mismatch=scheme.mismatch, gap=scheme.gap,
                    read_len=s_len, factor=scheme.factor,
                    semi_global=scheme.mode is Mode.SEMI_GLOBAL,
                )
                if self.backend == "pallas":
                    return bitpal.bitpal(eq, qcodes, interpret=config.interpret, **kw)
                return bitpal.bitpal_xla(eq, qcodes, **kw)
            if scheme.mode is Mode.SEMI_GLOBAL:
                from .ops import myers_semiglobal

                if self.backend == "pallas":
                    return myers_semiglobal.myers_semiglobal(
                        eq,
                        qcodes,
                        read_len=s_len,
                        factor=scheme.factor,
                        rows_per_block=config.rows_per_block,
                        interpret=config.interpret,
                    )
                return myers_semiglobal.myers_semiglobal_xla(
                    eq, qcodes, read_len=s_len, factor=scheme.factor
                )
            from .ops import myers_pallas, myers_xla

            if self.backend == "pallas":
                return myers_pallas.myers_global(
                    eq,
                    qcodes,
                    read_len=s_len,
                    word_bits=word_bits,
                    factor=scheme.factor,
                    rows_per_block=config.rows_per_block,
                    interpret=config.interpret,
                )
            return myers_xla.myers_global(
                eq, qcodes, read_len=s_len, word_bits=word_bits, factor=scheme.factor
            )

        @jax.jit
        def step(qcodes, scodes):
            eq = pack.pack_eq_jax(scodes, word_bits)
            return kernel(eq, qcodes).astype(jnp.int16)

        return step

    def scores(self, query_codes: np.ndarray, subject_codes: np.ndarray):
        """(Q, m) x (S, n) codes -> device array of (Q, S) int16 scores."""
        step = self._step(query_codes.shape[1], subject_codes.shape[1])
        return step(query_codes.astype(np.int32), subject_codes.astype(np.int32))


def run_alignment(
    query_path: str,
    db_path: str,
    result_path: str,
    scoring: Scoring = Scoring(0, -1, -1),
    mode: Mode = Mode.GLOBAL,
    config: PipelineConfig = PipelineConfig(),
) -> RunStats:
    """Full aligner run, reference CLI semantics; returns run statistics."""
    scheme = normalize(scoring, mode)
    engine = Engine(scheme, config)
    stats = RunStats()
    t_start = time.perf_counter()

    t0 = time.perf_counter()
    queries = seqfile.read_queries(query_path)
    db = seqfile.DatabaseReader(db_path, config.bucket_size, config.v_num)
    stats.read_time += time.perf_counter() - t0

    stats.query_count, stats.query_len = queries.shape
    stats.subject_len = db.length

    q_buckets = [
        queries[s : s + config.ref_bucket_count]
        for s in range(0, len(queries), config.ref_bucket_count)
    ]

    writer = result_io.ResultWriter(
        result_path, ref_count=len(queries), block_num=db.bucket_count, device_num=1
    )

    # Reader thread keeps the device fed (the reference's input_task thread).
    buckets: queue.Queue = queue.Queue(maxsize=config.prefetch)

    def read_all():
        t_read = 0.0
        for bucket in db:
            t0 = time.perf_counter()
            buckets.put(bucket)
            t_read += time.perf_counter() - t0
        buckets.put(None)

    reader = threading.Thread(target=read_all, daemon=True)
    t0 = time.perf_counter()
    reader.start()

    while True:
        bucket = buckets.get()
        if bucket is None:
            break
        stats.read_time += 0.0  # reading overlaps compute; counted in total
        writer.start_bucket([bucket.count], bucket.extra_count)
        stats.subject_count += bucket.count - bucket.extra_count
        for qb in q_buckets:
            t_cal = time.perf_counter()
            dev_scores = engine.scores(qb, bucket.codes)
            host_scores = np.asarray(dev_scores)
            stats.cal_time += time.perf_counter() - t_cal
            t_w = time.perf_counter()
            writer.write_scores(host_scores)
            stats.write_time += time.perf_counter() - t_w

    reader.join()
    writer.close()
    stats.total_time = time.perf_counter() - t_start
    return stats
