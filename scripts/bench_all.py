"""Full benchmark sweep: every kernel family on the current backend.

Prints a markdown table (and optionally writes it). The headline driver
metric stays in ../bench.py; this script is the engineering view.

Methodology: all variants of a workload are compiled first, then timed
interleaved (one rep of each, repeated) and reported as medians — the
remote-TPU service has ±10% run-to-run variance that sequential timing
conflates with real differences.

Usage: python scripts/bench_all.py [--quick]
"""

import argparse
import statistics
import time

import numpy as np


def _bench_interleaved(fns: dict, reps: int):
    for f in fns.values():
        np.asarray(f())  # compile + warm
    times = {k: [] for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f())
            times[k].append(time.perf_counter() - t0)
    return {k: statistics.median(ts) for k, ts in times.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller shapes, fewer reps")
    args = ap.parse_args()

    import jax

    from bgsa_tpu import pack
    from bgsa_tpu.ops import (banded, bitpal, bitpal_packed, myers_pallas,
                              myers_semiglobal, myers_xla)

    on_tpu = jax.default_backend() == "tpu"
    reps = 3 if args.quick else 6
    rows = []

    def add(name, fns, cells, unit="GCUPS", scale=1e9):
        meds = _bench_interleaved(fns, reps)
        for k, med in meds.items():
            rows.append((f"{name} {k}".strip(), cells / med / scale, unit))
            print(f"{name} {k}".strip().ljust(44), f"{cells / med / scale:10.1f} {unit}")

    rng = np.random.default_rng(0)

    # --- short subjects (the reference's headline config) ---
    Q, m, S, n = (8, 200, 4096, 200) if args.quick or not on_tpu else (40, 500, 32768, 500)
    queries = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    subjects = rng.integers(0, 4, size=(S, n))
    eq = jax.device_put(pack.pack_eq(subjects, 31))
    eq32 = jax.device_put(pack.pack_eq(subjects, 32))
    qd = jax.device_put(queries)
    cells = Q * m * S * n
    kw = dict(read_len=n, factor=-1)
    bp = dict(match=2, mismatch=-3, gap=-5, read_len=n, factor=1)

    myers = myers_pallas.myers_global if on_tpu else myers_xla.myers_global
    add("myers global 500bp", {"": lambda: myers(eq, qd, **kw)}, cells)
    if on_tpu:
        add("myers semi-global 500bp",
            {"": lambda: myers_semiglobal.myers_semiglobal(eq32, qd, read_len=n)}, cells)
        add("bitpal (2,-3,-5) 500bp", {
            "packed": lambda: bitpal_packed.bitpal_packed(eq, qd, **bp),
            "non-packed": lambda: bitpal.bitpal(eq, qd, **bp),
        }, cells)

    # --- long subjects (multi-word carry chain) ---
    if on_tpu and not args.quick:
        Ql, ml, Sl, nl = 8, 1000, 8192, 3000
        q2 = rng.integers(0, 4, size=(Ql, ml)).astype(np.int32)
        s2 = rng.integers(0, 4, size=(Sl, nl))
        eql = jax.device_put(pack.pack_eq(s2, 31))
        q2d = jax.device_put(q2)
        add("myers global 1000x3000bp",
            {"": lambda: myers_pallas.myers_global(eql, q2d, read_len=nl, factor=-1)},
            Ql * ml * Sl * nl)

    # --- banded filter workload ---
    k = 8
    nb = 150
    Sb = 8192 if args.quick or not on_tpu else 65536
    Qb = 8
    qb = rng.integers(0, 4, size=(Qb, nb)).astype(np.int32)
    sb = rng.integers(0, 4, size=(Sb, nb))
    for i in range(int(Sb * 0.3)):  # 30% near-duplicates of some query
        s = qb[i % Qb].copy()
        pos = rng.choice(nb, size=rng.integers(0, 6), replace=False)
        s[pos] = rng.integers(0, 4, size=len(pos))
        sb[i] = s
    rng.shuffle(sb, axis=0)
    il, ih, inj = map(jax.device_put, pack.pack_banded(sb, k, nb))
    qbd = jax.device_put(qb)
    bfn = banded.banded if on_tpu else banded.banded_xla
    bkw = dict(q_len=nb, s_len=nb, k=k)
    add("banded k=8 150bp", {"": lambda: bfn(il, ih, inj, qbd, **bkw)},
        Qb * Sb, unit="M align/s", scale=1e6)

    print()
    print("| Workload | Throughput |")
    print("|---|---|")
    for name, val, unit in rows:
        print(f"| {name} | {val:.1f} {unit} |")


if __name__ == "__main__":
    main()
