"""Experiment: fully-static column unrolling of the PACKED banded kernel.

PERF.md 8b measured full static unrolling on the STREAM kernel at +11-15%
on the 30%-mix workload (rejected as default: 45-75 s Mosaic compile per
geometry vs ~2-5 s). The packed kernel sits further under the issue-
coverage bar (21.1% of peak vs 31.8%), so the same trade is live again:
making every funnel-shift amount, window word and latch position a
compile-time constant removes the while_loop/fori machinery entirely and
gives Mosaic a branch-free straight-line body to schedule.

Measures, per workload (30%-mix and all-garbage):
  shipping   banded_stream_packed r64/u16 (while_loop batches + block exit)
  static_r64 static_cols=True, r64
  static_r32 static_cols=True, r32
with a bit-exactness gate first and interleaved medians (8 reps), plus the
wall-clock compile+load cost of each variant.

Run on the chip: python scripts/exp_banded_packed_static.py
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from bgsa_tpu.benchutil import chain_of, filter_mix_dataset
from bgsa_tpu.ops import banded_packed as bp


def run_kind(kind, rng):
    k, m = 8, 150
    n_sub = bp.packed_subbands(m, m, k)
    Q = 8
    S = (65536 // (n_sub * 128)) * (n_sub * 128)
    if kind == "garbage":
        q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
        s = np.asarray(rng.integers(0, 4, size=(S, m)), np.int64)
    else:
        q, s = filter_mix_dataset(rng, Q, S, m)
    qd = jax.device_put(q)
    kw = dict(q_len=m, s_len=m, k=k)
    streams = jax.device_put(np.asarray(
        bp.pack_packed_streams_jax(np.asarray(s, np.int32), k, m, n_sub)))

    variants = {
        "shipping_r64u16": lambda q: bp.banded_stream_packed(streams, q, **kw),
        "static_r64": lambda q: bp.banded_stream_packed(
            streams, q, static_cols=True, **kw),
        "static_r32": lambda q: bp.banded_stream_packed(
            streams, q, static_cols=True, rows_per_block=32, **kw),
    }

    print(f"[{kind}] bit-exactness gate ...", file=sys.stderr)
    want = np.asarray(variants["shipping_r64u16"](qd))
    for name in ("static_r64", "static_r32"):
        got = np.asarray(variants[name](qd))
        assert (want == got).all(), \
            f"MISMATCH {name}: {np.argwhere(want != got)[:5]}"
    print(f"[{kind}] bit-exact", file=sys.stderr)

    samples = {}
    for name, run in variants.items():
        t0 = time.perf_counter()
        samples[name] = chain_of(run, qd, 24)
        samples[name]()
        print(f"[{kind}] compile+load {name}: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
    times = {name: [] for name in samples}
    for rep in range(8):
        for name, sm in samples.items():
            t0 = time.perf_counter()
            sm()
            times[name].append(time.perf_counter() - t0)
        print(f"[{kind}] rep {rep + 1}/8", file=sys.stderr)
    cells = Q * m * S * m * 24
    rates = {n: cells / statistics.median(t) / 1e9 for n, t in times.items()}
    base = rates["shipping_r64u16"]
    for n, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"[{kind}] {n:16s}: {r:6.0f} GCUPS billed = "
              f"{r * 1e9 / m / m / 1e6:5.0f} M align/s  ({r / base - 1:+.1%})")


def main():
    rng = np.random.default_rng(13)
    for kind in ("mix", "garbage"):
        run_kind(kind, rng)


if __name__ == "__main__":
    main()
