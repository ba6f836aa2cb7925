"""Honest kernel timing on a remote-tunnel TPU: in-jit serial chains.

Every host-dispatched program on this setup pays a ~25-30 ms tunnel
round-trip floor, and ``block_until_ready`` returns early through the
tunnel — so the only trustworthy kernel timing runs N invocations chained
INSIDE one jit program and fetches a single scalar (see docs/PERF.md
"The dispatch floor"). Both benchmark drivers (bench.py,
scripts/bench_all.py) share this builder so a fix to the dependency term
lands in every measurement.
"""

import numpy as np


def backend_alive(probe_secs: float = 900.0) -> bool:
    """Probe the remote TPU service in a subprocess before any on-chip work.

    Backend init (jax.devices()) blocks inside the remote PJRT client when
    the tunnel is down — observed hanging >2 h with no error (CLAUDE.md
    2026-08-17). The documented slow episodes are multi-minute, hence the
    generous default deadline. CPU backends cannot hang; returns True
    without probing.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "") in ("", "cpu"):
        return True
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=probe_secs, capture_output=True, text=True)
        return r.returncode == 0 and "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def filter_mix_dataset(rng, n_queries: int, n_subjects: int, length: int,
                       near_frac: float = 0.3):
    """The banded benchmark workload: (queries, subjects) int arrays where
    ``near_frac`` of the subjects are near-duplicates of some query (0-5
    random edits) and the rest random — the realistic read-filter mix both
    benchmark drivers must measure identically."""
    qb = rng.integers(0, 4, size=(n_queries, length)).astype(np.int32)
    sb = rng.integers(0, 4, size=(n_subjects, length))
    for i in range(int(n_subjects * near_frac)):
        s = qb[i % n_queries].copy()
        pos = rng.choice(length, size=rng.integers(0, 6), replace=False)
        s[pos] = rng.integers(0, 4, size=len(pos))
        sb[i] = s
    rng.shuffle(sb, axis=0)
    return qb, sb


def chain_of(run_q, queries_dev, n_chain: int):
    """Zero-arg sampler: one jit program executing ``run_q`` ``n_chain``
    times serially, ending in one device scalar (the caller's call fetches
    4 bytes).

    Iteration i+1's query input adds ``|out_i[0,0]| >> 30`` — always 0 for
    every kernel family's score range (|score| < 2^30; scores are bounded
    by ±max_weight·len ≤ 5·4000 for BitPAl, ±len for Myers, 127 for
    banded), but unprovable at compile time, so the compiler can neither
    parallelize nor CSE the invocations.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(q):
        out = run_q(q)
        for _ in range(n_chain - 1):
            dep = jnp.abs(out[0:1, 0:1]) // jnp.int32(1 << 30)
            out = run_q(q + dep)
        return out[0, 0] + out[-1, -1]

    return lambda: np.asarray(prog(queries_dev))
