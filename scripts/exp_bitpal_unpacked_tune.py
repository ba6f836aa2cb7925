"""Tuning sweep for the unpacked 32-bit compare-carry BitPAl kernel.

The r16/u10 defaults were tuned on the 31-bit layout (round 1); this
sweeps rows_per_block x unroll on the 32-bit variant and re-confirms the
+6.2% 32-vs-31 result in a second service window (PERF.md methodology:
re-run surprising numbers across windows). Bit-exact gate first.

Run on the chip: python scripts/exp_bitpal_unpacked_tune.py
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from bgsa_tpu import pack
from bgsa_tpu.benchutil import chain_of
from bgsa_tpu.ops import bitpal


def main():
    rng = np.random.default_rng(11)
    M, I, G = 2, -3, -5
    Q, m, S, n = 40, 500, 32768, 500
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(S, n))
    qd = jax.device_put(q)
    eq31 = jax.device_put(pack.pack_eq(s, 31))
    eq32 = jax.device_put(pack.pack_eq(s, 32))
    kw = dict(match=M, mismatch=I, gap=G, read_len=n)

    # unroll pinned explicitly on every variant: the 32-bit default became
    # u20 after this sweep's first run, so relying on defaults would silently
    # turn the u10 baselines into u20 duplicates on a re-run.
    variants = {
        "31bit_r16u10": lambda qq: bitpal.bitpal(eq31, qq, unroll=10, **kw),
        "32bit_r16u10": lambda qq: bitpal.bitpal(
            eq32, qq, word_bits=32, unroll=10, **kw),
        "32bit_r8u10": lambda qq: bitpal.bitpal(
            eq32, qq, word_bits=32, rows_per_block=8, unroll=10, **kw),
        "32bit_r32u10": lambda qq: bitpal.bitpal(
            eq32, qq, word_bits=32, rows_per_block=32, unroll=10, **kw),
        "32bit_r16u20": lambda qq: bitpal.bitpal(
            eq32, qq, word_bits=32, unroll=20, **kw),
    }

    print("gate ...", file=sys.stderr)
    want = np.asarray(variants["31bit_r16u10"](qd))
    for name in list(variants)[1:]:
        got = np.asarray(variants[name](qd))
        assert (want == got).all(), f"MISMATCH {name}"
    print("bit-exact", file=sys.stderr)

    samples = {}
    for name, run in variants.items():
        t0 = time.perf_counter()
        samples[name] = chain_of(run, qd, 4)
        samples[name]()
        print(f"compile+load {name}: {time.perf_counter()-t0:.1f} s",
              file=sys.stderr)
    times = {name: [] for name in samples}
    for rep in range(8):
        for name, sm in samples.items():
            t0 = time.perf_counter()
            sm()
            times[name].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/8", file=sys.stderr)
    cells = Q * m * S * n * 4
    rates = {nm: cells / statistics.median(t) / 1e9 for nm, t in times.items()}
    base = rates["31bit_r16u10"]
    for nm, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"{nm:14s}: {r:6.1f} GCUPS  ({r / base - 1:+.1%} vs 31-bit default)")


if __name__ == "__main__":
    main()
