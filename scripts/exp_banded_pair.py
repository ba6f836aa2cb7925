"""Experiment: two queries per banded grid cell (round-4 roofline followup).

The roofline (docs/PERF.md) put the banded stream kernel at 31.8% of the
measured VPU issue peak — its column is ONE serial 2-word chain per tile
(vs the Myers kernels' 16 independent words). Hypothesis: interleaving two
queries' band recurrences in one kernel cell doubles the independent work
per instruction window and lifts issue utilization.

Drives a modified _stream_kernel that carries two full band states (the
grid's query axis halves), verifies bit-exactness against the shipping
banded_stream on the standard filter-mix workload, then A/Bs with
interleaved medians (in-jit chains, bench methodology).

Run on the chip: python scripts/exp_banded_pair.py
"""

import functools
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bgsa_tpu import pack
from bgsa_tpu.benchutil import chain_of, filter_mix_dataset
from bgsa_tpu.ops import banded, blockutil
from bgsa_tpu.ops.banded import _geometry, _chk_array, _stream_column, _epilogue

LANES = 128


def _stream_kernel_pair(q_ref, chk_ref, stream_ref, out_ref, *, q_len, s_len,
                        k, unroll, block_exit=True):
    h, band_down, max_err = _geometry(q_len, s_len, k)
    R, L = stream_ref.shape[-2], stream_ref.shape[-1]
    tile = (R, L)
    kw = dict(k=k, m=q_len, band_down=band_down, max_err=max_err)
    load = lambda c, w: stream_ref[c, w]  # noqa: E731

    def column_pair(t, sa, sb):
        chk = chk_ref[0, 0, t]
        sa = _stream_column(t, sa, q_ref[0, 0, t], load, chk=chk, **kw)
        sb = _stream_column(t, sb, q_ref[1, 0, t], load, chk=chk, **kw)
        return sa, sb

    zeros = jnp.zeros(tile, jnp.uint32)
    init = (zeros, zeros, zeros, zeros,
            jnp.full(tile, k, jnp.int32), jnp.zeros(tile, jnp.int32))
    sa, sb = init, init

    BATCH_COLS = 32
    n_batches = q_len // BATCH_COLS
    from bgsa_tpu.ops.banded import checkpoint_columns
    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)

    def batch_cond(carry):
        i, sa, sb = carry
        both_dead = jnp.logical_and(jnp.all(sa[5] > 0), jnp.all(sb[5] > 0))
        return jnp.logical_and(i < n_batches, jnp.logical_not(both_dead))

    def batch_body(carry):
        i, sa, sb = carry
        base = i * BATCH_COLS

        def inner(j, st):
            sa, sb = st
            for u in range(unroll):
                sa, sb = column_pair(base + j * unroll + u, sa, sb)
            return sa, sb

        sa, sb = lax.fori_loop(0, BATCH_COLS // unroll, inner, (sa, sb))
        mark = ((i + 1) * BATCH_COLS <= jnp.int32(last_chk)).astype(jnp.int32)

        def latch(st):
            vplo, vphi, vnlo, vnhi, err, dead = st
            dead = dead | (mark & (err > jnp.int32(max_err)).astype(jnp.int32))
            return (vplo, vphi, vnlo, vnhi, err, dead)

        return i + 1, latch(sa), latch(sb)

    if block_exit:
        _, sa, sb = lax.while_loop(batch_cond, batch_body, (jnp.int32(0), sa, sb))
    else:
        sa, sb = lax.fori_loop(
            jnp.int32(0), jnp.int32(n_batches),
            lambda i, st: batch_body((i, *st))[1:], (sa, sb))

    def tail(st, qrow):
        def col(t, s):
            return _stream_column(t, s, q_ref[qrow, 0, t], load,
                                  chk=chk_ref[0, 0, t], **kw)
        return lax.fori_loop(n_batches * BATCH_COLS, q_len, col, st)

    sa = tail(sa, 0)
    sb = tail(sb, 1)
    out_ref[0] = _epilogue((None, None) + sa, h=h)
    out_ref[1] = _epilogue((None, None) + sb, h=h)


@functools.partial(
    jax.jit, static_argnames=("q_len", "s_len", "k", "rows_per_block", "unroll"))
def banded_stream_pair(stream, queries, *, q_len, s_len, k,
                       rows_per_block=64, unroll=16):
    C, W, S = stream.shape
    Q, m = queries.shape
    assert Q % 2 == 0, "pad queries to an even count"
    rows = S // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nb = rows_p // r
    chk = np.zeros((1, 1, m), np.int32)
    chk[0, 0] = _chk_array(q_len, s_len, k)
    stream4 = blockutil.pad_rows(stream.reshape(C, W, rows, LANES), 2, rows_p)
    out = pl.pallas_call(
        functools.partial(_stream_kernel_pair, q_len=q_len, s_len=s_len, k=k,
                          unroll=max(u for u in (1, 2, 4, 8, 16, 32)
                                     if u <= max(1, min(unroll, 32)))),
        grid=(nb, Q // 2),
        in_specs=[
            pl.BlockSpec((2, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda b, q: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, W, r, LANES), lambda b, q: (0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((2, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * Q * m * S, bytes_accessed=stream.size * 4 + Q * S * 4,
            transcendentals=0),
    )(jnp.asarray(queries, jnp.int32)[:, None, :], jnp.asarray(chk), stream4)
    return out[:, :rows].reshape(Q, S)


def _probe_kernel(q_ref, stream_ref, out_ref, *, q_len, s_len, k, unroll, mode):
    """Cost-decomposition probes (wrong math except 'full'): same loop
    structure (plain fori, no early exit), varying how much of the column's
    non-ALU work runs. 'full' = shipping column (dynamic char + funnel);
    'static_c' = char index pinned to 0 (no per-column SMEM read / dynamic
    plane index); 'noload' = Eq window hoisted out of the loop entirely
    (pure _band_update ALU chain). Differences bound the funnel-load and
    scalar-index costs."""
    from bgsa_tpu.ops.banded import _band_update

    h, band_down, max_err = _geometry(q_len, s_len, k)
    R, L = stream_ref.shape[-2], stream_ref.shape[-1]
    tile = (R, L)
    kw = dict(k=k, m=q_len, band_down=band_down, max_err=max_err)
    load = lambda c, w: stream_ref[c, w]  # noqa: E731
    zeros = jnp.zeros(tile, jnp.uint32)
    eq_hoisted = load(0, 0)

    def col(t, st):
        if mode == "full":
            return _stream_column(t, st, q_ref[0, 0, t], load,
                                  chk=jnp.int32(0), **kw)
        if mode == "static_c":
            return _stream_column(t, st, 0, load, chk=jnp.int32(0), **kw)
        return _band_update(t, st, eq_hoisted, zeros, k=k, max_err=max_err,
                            chk=jnp.int32(0))

    init = (zeros, zeros, zeros, zeros,
            jnp.full(tile, k, jnp.int32), jnp.zeros(tile, jnp.int32))

    def inner(j, st):
        for u in range(unroll):
            st = col(j * unroll + u, st)
        return st

    st = lax.fori_loop(0, q_len // unroll, inner, init)
    for t in range((q_len // unroll) * unroll, q_len):
        st = col(t, st)
    out_ref[0] = _epilogue((None, None) + st, h=h)


@functools.partial(
    jax.jit, static_argnames=("q_len", "s_len", "k", "rows_per_block",
                              "unroll", "mode"))
def banded_probe(stream, queries, *, q_len, s_len, k, mode,
                 rows_per_block=64, unroll=16):
    C, W, S = stream.shape
    Q, m = queries.shape
    rows = S // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nb = rows_p // r
    stream4 = blockutil.pad_rows(stream.reshape(C, W, rows, LANES), 2, rows_p)
    out = pl.pallas_call(
        functools.partial(_probe_kernel, q_len=q_len, s_len=s_len, k=k,
                          unroll=unroll, mode=mode),
        grid=(nb, Q),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, W, r, LANES), lambda b, q: (0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * Q * m * S, bytes_accessed=stream.size * 4 + Q * S * 4,
            transcendentals=0),
    )(jnp.asarray(queries, jnp.int32)[:, None, :], stream4)
    return out[:, :rows].reshape(Q, S)


def main():
    rng = np.random.default_rng(7)
    k, nb_len = 8, 150
    Qb, Sb = 8, 65536
    qb, sb = filter_mix_dataset(rng, Qb, Sb, nb_len)
    qbd = jax.device_put(qb)
    stream = jax.device_put(np.asarray(jax.jit(
        pack.pack_banded_stream_jax, static_argnums=(1, 2))(sb, k, nb_len)))
    kw = dict(q_len=nb_len, s_len=nb_len, k=k)

    print("bit-exactness check ...", file=sys.stderr)
    want = np.asarray(banded.banded_stream(stream, qbd, **kw))
    got = np.asarray(banded_stream_pair(stream, qbd, **kw))
    assert (want == got).all(), f"MISMATCH: {np.argwhere(want != got)[:5]}"
    print("bit-exact vs banded_stream", file=sys.stderr)

    variants = {
        "single": lambda q: banded.banded_stream(stream, q, **kw),
        "pair": lambda q: banded_stream_pair(stream, q, **kw),
        # wrong-math cost decomposition (same fori structure, no early exit)
        "p_full": lambda q: banded_probe(stream, q, mode="full", **kw),
        "p_statc": lambda q: banded_probe(stream, q, mode="static_c", **kw),
        "p_noload": lambda q: banded_probe(stream, q, mode="noload", **kw),
    }
    samples = {name: chain_of(run, qbd, 24) for name, run in variants.items()}
    for s in samples.values():
        s()
    times = {name: [] for name in samples}
    for _ in range(8):  # interleaved medians
        for name, s in samples.items():
            t0 = time.perf_counter(); s(); times[name].append(time.perf_counter() - t0)
    cells = Qb * nb_len * Sb * nb_len * 24
    rates = {n: cells / statistics.median(t) / 1e9 for n, t in times.items()}
    base = rates["single"]
    for n, r in rates.items():
        print(f"{n:8s}: {r:.0f} GCUPS billed = {r*1e9/nb_len/nb_len/1e6:.0f} M "
              f"align/s  ({r/base-1:+.1%})")


if __name__ == "__main__":
    main()
