"""Full benchmark sweep: every kernel family on the current backend.

Prints a markdown table. The headline driver metric stays in ../bench.py;
this script is the engineering view.

Methodology (see docs/PERF.md): all variants compile first, then are timed
interleaved (one rep of each, repeated) and reported as medians. Each timed
sample runs N kernel invocations chained INSIDE one jit program with a
value-preserving data dependency between them, ending in one device scalar
(4-byte fetch) — true device time. Host-side chaining is not enough: every
host-dispatched program pays the remote tunnel's ~25-30 ms dispatch floor,
which swamped sub-10 ms kernels (banded measured 9x slow that way).

Usage: python scripts/bench_all.py [--quick]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller shapes, fewer reps")
    args = ap.parse_args()

    from bgsa_tpu.benchutil import backend_alive, chain_of, filter_mix_dataset

    if not backend_alive():
        raise SystemExit(
            "TPU service unresponsive (backend init probe timed out); "
            "retry later or run with JAX_PLATFORMS=cpu for the XLA rows"
        )

    import jax

    from bgsa_tpu import pack
    from bgsa_tpu.ops import (banded, bitpal, bitpal_packed, myers_pallas,
                              myers_semiglobal, myers_xla)

    on_tpu = jax.default_backend() == "tpu"
    reps = 3 if args.quick else 6
    rows = []

    def sm(call_q, queries_dev, n_chain):
        """In-jit serial chain sampler (bgsa_tpu.benchutil.chain_of; see
        docs/PERF.md on the tunnel dispatch floor)."""
        if args.quick or not on_tpu:
            n_chain = min(n_chain, 2)
        return chain_of(call_q, queries_dev, n_chain), n_chain

    def add(name, calls, cells, queries_dev, n_chain, unit="GCUPS", scale=1e9):
        fns = {k: sm(c, queries_dev, n_chain) for k, c in calls.items()}
        for f, _ in fns.values():
            f()  # compile + warm
        times = {k: [] for k in fns}
        for _ in range(reps):
            for k, (f, nc) in fns.items():
                t0 = time.perf_counter()
                f()
                times[k].append((time.perf_counter() - t0) / nc)
        for k, ts in times.items():
            label = f"{name} {k}".strip()
            val = cells / statistics.median(ts) / scale
            rows.append((label, val, unit))
            print(f"{label:52s} {val:10.1f} {unit}")

    rng = np.random.default_rng(0)

    # --- short subjects (the reference's headline config) ---
    Q, m, S, n = (8, 200, 4096, 200) if args.quick or not on_tpu else (40, 500, 32768, 500)
    queries = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    subjects = rng.integers(0, 4, size=(S, n))
    eq = jax.device_put(pack.pack_eq(subjects, 31))
    eq32 = jax.device_put(pack.pack_eq(subjects, 32))
    qd = jax.device_put(queries)
    cells = Q * m * S * n
    bp = dict(match=2, mismatch=-3, gap=-5, read_len=n, factor=1)

    if on_tpu:
        add("myers global 500bp", {
            "full-word": lambda q: myers_semiglobal.myers_semiglobal(
                eq32, q, read_len=n, factor=-1, is_global=True),
            "31-bit": lambda q: myers_pallas.myers_global(eq, q, read_len=n, factor=-1),
        }, cells, qd, 8)
        add("myers semi-global 500bp",
            {"": lambda q: myers_semiglobal.myers_semiglobal(eq32, q, read_len=n)},
            cells, qd, 8)
        add("bitpal (2,-3,-5) 500bp", {
            "packed": lambda q: bitpal_packed.bitpal_packed(eq, q, **bp),
            "packed-32 carry": lambda q: bitpal_packed.bitpal_packed(
                eq32, q, word_bits=32, **bp),
            "non-packed": lambda q: bitpal.bitpal(eq, q, **bp),
        }, cells, qd, 3)
    else:
        add("myers global (xla cpu)",
            {"": lambda q: myers_xla.myers_global(eq, q, read_len=n, factor=-1)},
            cells, qd, 2)

    # --- long subjects (multi-word carry chain) ---
    if on_tpu and not args.quick:
        Ql, ml, Sl, nl = 8, 1000, 8192, 3000
        q2 = rng.integers(0, 4, size=(Ql, ml)).astype(np.int32)
        s2 = rng.integers(0, 4, size=(Sl, nl))
        eql = jax.device_put(pack.pack_eq(s2, 32))
        q2d = jax.device_put(q2)
        add("myers global 1000x3000bp",
            {"": lambda q: myers_semiglobal.myers_semiglobal(
                eql, q, read_len=nl, factor=-1, is_global=True)},
            Ql * ml * Sl * nl, q2d, 3)

    # --- banded filter workload ---
    k = 8
    nb = 150
    Sb = 8192 if args.quick or not on_tpu else 65536
    Qb = 8
    qb, sb = filter_mix_dataset(rng, Qb, Sb, nb)  # same mix as bench.py
    il, ih, inj = map(jax.device_put, pack.pack_banded(sb, k, nb))
    qbd = jax.device_put(qb)
    bkw = dict(q_len=nb, s_len=nb, k=k)
    if on_tpu:
        stream = jax.device_put(np.asarray(
            jax.jit(pack.pack_banded_stream_jax, static_argnums=(1, 2))(sb, k, nb)
        ))
        streams2 = jax.device_put(np.asarray(
            jax.jit(pack.pack_banded_streams_jax, static_argnums=(1, 2))(sb, k, nb)
        ))
        add("banded k=8 150bp", {
            "stream (engine path)": lambda q: banded.banded_stream(stream, q, **bkw),
            "dual-stream": lambda q: banded.banded_stream_dual(streams2, q, **bkw),
            "peq-carry": lambda q: banded.banded(il, ih, inj, q, **bkw),
        }, Qb * Sb, qbd, 24, unit="M align/s", scale=1e6)
    else:
        add("banded k=8 150bp",
            {"": lambda q: banded.banded_xla(il, ih, inj, q, **bkw)},
            Qb * Sb, qbd, 2, unit="M align/s", scale=1e6)

    print()
    print("| Workload | Throughput |")
    print("|---|---|")
    for name, val, unit in rows:
        print(f"| {name} | {val:.1f} {unit} |")


if __name__ == "__main__":
    main()
