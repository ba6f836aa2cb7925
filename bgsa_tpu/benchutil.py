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
