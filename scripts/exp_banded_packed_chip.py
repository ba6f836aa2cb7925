"""On-chip A/B: packed-field banded kernel vs the shipping stream kernel.

The packed kernel (ops/banded_packed.py) folds n_sub subjects' bands into
each 64-bit register pair (n_sub = 3 at the k=8/150bp headline), cutting
vector ops per cell ~3x at the same chain depth. The round-4 roofline put
the stream kernel at 31.8% of the VPU issue peak with every cheap
hypothesis refuted (scripts/exp_banded_pair.py) — subject-packing is the
one remaining algorithmic lever (docs/PERF.md).

Methodology: bit-exactness gate first, then interleaved medians of in-jit
24-deep chains (docs/PERF.md "The dispatch floor" — host-side timing bills
the ~25 ms tunnel dispatch floor to the kernel).

Run on the chip: python scripts/exp_banded_packed_chip.py [mix|garbage|pass]
"""

import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from bgsa_tpu import pack
from bgsa_tpu.benchutil import chain_of, filter_mix_dataset
from bgsa_tpu.ops import banded, banded_packed as bp


def dataset(rng, kind, Q, S, length):
    if kind == "mix":
        return filter_mix_dataset(rng, Q, S, length)
    q = rng.integers(0, 4, size=(Q, length)).astype(np.int32)
    if kind == "garbage":
        s = rng.integers(0, 4, size=(S, length))
    else:  # all-pass: every subject a light mutation of query 0
        s = np.repeat(q[:1], S, 0).copy()
        muts = rng.integers(0, length, size=(S, 3))
        for j in range(3):
            s[np.arange(S), muts[:, j]] = rng.integers(0, 4, size=S)
    return q, np.asarray(s, np.int64)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "mix"
    rng = np.random.default_rng(11)
    k, m = 8, 150
    n_sub = bp.packed_subbands(m, m, k)
    Q = 8
    S = (65536 // (n_sub * 128)) * (n_sub * 128)  # 65280 at n_sub=3
    q, s = dataset(rng, kind, Q, S, m)
    qd = jax.device_put(q)
    kw = dict(q_len=m, s_len=m, k=k)

    s32 = np.asarray(s, np.int32)
    stream = jax.device_put(np.asarray(jax.jit(
        pack.pack_banded_stream_jax, static_argnums=(1, 2))(s32, k, m)))
    streams_p = jax.device_put(np.asarray(
        bp.pack_packed_streams_jax(s32, k, m, n_sub)))

    print(f"[{kind}] n_sub={n_sub} S={S}; bit-exactness gate ...",
          file=sys.stderr)
    want = np.asarray(banded.banded_stream(stream, qd, **kw))
    got = np.asarray(bp.banded_stream_packed(streams_p, qd, **kw))
    assert (want == got).all(), f"MISMATCH {np.argwhere(want != got)[:5]}"
    print("bit-exact on chip", file=sys.stderr)

    variants = {"stream_r64u16": lambda q: banded.banded_stream(stream, q, **kw)}
    for r in (32, 64, 128):
        for u in (8, 16, 32):
            variants[f"packed_r{r}u{u}"] = (
                lambda q, r=r, u=u: bp.banded_stream_packed(
                    streams_p, q, rows_per_block=r, unroll=u, **kw))

    samples = {}
    for name, run in variants.items():
        print(f"compile {name}", file=sys.stderr)
        samples[name] = chain_of(run, qd, 24)
        samples[name]()  # warm + load
    times = {name: [] for name in samples}
    for rep in range(8):
        for name, sm in samples.items():
            t0 = time.perf_counter(); sm(); times[name].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/8", file=sys.stderr)
    cells = Q * m * S * m * 24
    rates = {n: cells / statistics.median(t) / 1e9 for n, t in times.items()}
    base = rates["stream_r64u16"]
    for n, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"{n:16s}: {r:6.0f} GCUPS billed = "
              f"{r * 1e9 / m / m / 1e6:5.0f} M align/s  ({r / base - 1:+.1%})")


if __name__ == "__main__":
    main()
