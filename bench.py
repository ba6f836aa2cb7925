"""Headline benchmark: unit-cost global Myers GCUPS on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 500 GCUPS, the reference's AVX512 per-socket unit-cost number
(BASELINE.md; images/cpu.png read-off ~470-525 on a Xeon W-2123).

Workload mirrors the reference's headline config: 500 bp queries x 500 bp
subjects, kernel-time GCUPS (the reference's "cal GCUPS",
original/BGSA_SSE/cal_sse.c:485).
"""

import json
import time

import numpy as np

BASELINE_GCUPS = 500.0


def main():
    import jax

    from bgsa_tpu import pack
    from bgsa_tpu.ops import myers_pallas, myers_xla

    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False

    if on_tpu:
        Q, m, S, n = 40, 500, 32768, 500
    else:  # CPU smoke fallback so the script always emits a line
        Q, m, S, n = 2, 100, 512, 100

    rng = np.random.default_rng(0)
    queries = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    subjects = rng.integers(0, 4, size=(S, n))
    eq = jax.device_put(pack.pack_eq(subjects, 31))
    qd = jax.device_put(queries)

    if on_tpu:
        run = lambda: myers_pallas.myers_global(eq, qd, read_len=n, factor=-1)
    else:
        run = lambda: myers_xla.myers_global(eq, qd, read_len=n, factor=-1)

    np.asarray(run())  # compile + warm up
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run())  # includes D2H of the (Q, S) scores
        best = min(best, time.perf_counter() - t0)

    cells = Q * m * S * n
    gcups = cells / best / 1e9
    print(
        json.dumps(
            {
                "metric": "unit-cost Myers cal GCUPS (1 chip, 500bp x 500bp)",
                "value": round(gcups, 1),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
