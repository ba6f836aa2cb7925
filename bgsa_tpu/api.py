"""In-memory embedding API: align sequences without temporary files.

The reference documents two embedding paths (``/root/reference/README.md:94-165``):
either round-trip through its temp-file formats, or hand-prepare packed arrays
and call the generated kernel ABI directly (its demo.c). Here the same
capability is one call on Python strings/arrays::

    import bgsa_tpu
    scores = bgsa_tpu.align("AAAA", ["AAAA", "AACA", "CAAC", "AGGG"])
    # -> array([ 0, -1, -2, -3], dtype=int16)

Lane padding (the reference demo's V_NUM round-up; code-0 fill so N-free
batches keep the 2-bit transport), bit packing
(``sse_handle_reads``), and kernel dispatch are handled internally; the
returned array is trimmed back to the real subject count. Engines are cached
per (scheme, config) so repeated calls skip recompilation.
"""

from __future__ import annotations

import numpy as np

from . import pack
from .schemes import Mode, Scoring

_ENGINES: dict = {}


def encode_sequences(seqs, *, name: str = "sequences") -> np.ndarray:
    """Strings / bytes / code arrays -> (count, len) int32 symbol codes.

    Accepts a single string, an iterable of equal-length strings/bytes, or an
    integer array already holding codes 0..4 (A,C,G,T,N — pack.MAPPING).
    """
    if isinstance(seqs, (str, bytes)):
        seqs = [seqs]
    if isinstance(seqs, np.ndarray) and seqs.dtype.kind in "iu":
        arr = np.atleast_2d(seqs).astype(np.int32)
        if arr.min() < 0 or arr.max() > 4:
            raise ValueError(f"{name}: integer codes must be in 0..4")
        return arr
    rows = [s.encode() if isinstance(s, str) else bytes(s) for s in seqs]
    if not rows:
        raise ValueError(f"{name}: empty")
    length = len(rows[0])
    if any(len(r) != length for r in rows):
        raise ValueError(f"{name}: all sequences must have the same length")
    buf = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), length)
    return pack.encode_ascii(buf).astype(np.int32)


def _pad_lanes(codes: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    count = codes.shape[0]
    total = -(-count // multiple) * multiple
    if total == count:
        return codes, count
    # Pad rows use code 0, not 'N' (4): pad scores are sliced off either
    # way, and an 'N' fill would push every N-free batch off the 2-bit
    # transport onto the 2x-wider nibble upload (pipeline.run_bucketed pads
    # with 0 for the same reason).
    padded = np.zeros((total, codes.shape[1]), np.int32)
    padded[:count] = codes
    return padded, count


def align(
    queries,
    subjects,
    *,
    scoring: Scoring = Scoring(0, -1, -1),
    mode: Mode = Mode.GLOBAL,
    k: int | None = None,
    config=None,
) -> np.ndarray:
    """Score queries against subjects in memory.

    Args:
      queries: one string or a list of equal-length strings (or a code array).
      subjects: list of equal-length strings (or a code array).
      scoring: (match, mismatch, gap) — unit costs select Myers, general
        integer costs select BitPAl (the reference's generator-time -M/-I/-G).
      mode: GLOBAL or SEMI_GLOBAL.
      k: banded-Myers error threshold; when given, scoring/mode are ignored
        (the banded family is unit-cost) and scores are error counts with
        127 = "exceeds threshold" (the reference's -k filter).
      config: optional pipeline.PipelineConfig (backend, shards, ...).

    Returns:
      (Q, S) scores — or (S,) when `queries` is a single string.
    """
    from .pipeline import PipelineConfig

    single = isinstance(queries, (str, bytes)) or (
        isinstance(queries, np.ndarray)
        and queries.ndim == 1
        and queries.dtype.kind in "iu"  # a 1-D array of strings is multi-query
    )
    qcodes = encode_sequences(queries, name="queries")
    scodes = encode_sequences(subjects, name="subjects")
    config = config or PipelineConfig()

    if k is not None:
        from .banded_pipeline import BandedEngine

        key = ("banded", k, config)
        engine = _ENGINES.get(key)
        if engine is None:
            engine = _ENGINES.setdefault(key, BandedEngine(k, config))
    else:
        from .pipeline import Engine
        from .schemes import normalize

        scheme = normalize(scoring, mode)
        key = (scheme, config)
        engine = _ENGINES.get(key)
        if engine is None:
            engine = _ENGINES.setdefault(key, Engine(scheme, config))

    # Lane padding must cover the local shard split too (each device's slice
    # needs a multiple of 128 lanes).
    scodes, real_count = _pad_lanes(scodes, config.v_num * engine.n_shards)
    out = np.asarray(engine.scores(qcodes, scodes))

    out = out[:, :real_count]
    return out[0] if single else out
