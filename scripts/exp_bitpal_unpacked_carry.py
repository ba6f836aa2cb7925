"""A/B: non-packed BitPAl 31-bit reserved-carry vs 32-bit compare-carry.

The unpacked twin of PERF.md #10's packed measurement (31-bit 992.1 vs
32-bit 971.5 GCUPS): at 500 bp the full-word layout saves one word of
state/Eq (17 -> 16) per plane but pays ~2 extra vector ops per cross-word
add (the unsigned compares) across the (M-2G+1)-plane network. Bit-exact
gate vs the oracle + 31-bit kernel first; interleaved medians.

Run on the chip: python scripts/exp_bitpal_unpacked_carry.py
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from bgsa_tpu import oracle, pack
from bgsa_tpu.benchutil import chain_of
from bgsa_tpu.ops import bitpal
from bgsa_tpu.schemes import Scoring


def main():
    rng = np.random.default_rng(7)
    M, I, G = 2, -3, -5
    Q, m, S, n = 40, 500, 32768, 500
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 4, size=(S, n))
    qd = jax.device_put(q)
    eq31 = jax.device_put(pack.pack_eq(s, 31))
    eq32 = jax.device_put(pack.pack_eq(s, 32))
    kw = dict(match=M, mismatch=I, gap=G, read_len=n)

    print("gate ...", file=sys.stderr)
    want = np.stack([oracle.align_scores(qi, s[:64], Scoring(M, I, G))
                     for qi in q[:2]])
    a = np.asarray(bitpal.bitpal(eq31, qd, **kw))
    b = np.asarray(bitpal.bitpal(eq32, qd, word_bits=32, **kw))
    assert (a == b).all(), f"MISMATCH {np.argwhere(a != b)[:5]}"
    assert (a[:2, :64] == want).all()
    print("bit-exact (and oracle-checked)", file=sys.stderr)

    variants = {
        "unpacked_31bit": lambda qq: bitpal.bitpal(eq31, qq, **kw),
        "unpacked_32bit_carry": lambda qq: bitpal.bitpal(
            eq32, qq, word_bits=32, **kw),
    }
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
    base = rates["unpacked_31bit"]
    for nm, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"{nm:22s}: {r:6.1f} GCUPS  ({r / base - 1:+.1%})")


if __name__ == "__main__":
    main()
