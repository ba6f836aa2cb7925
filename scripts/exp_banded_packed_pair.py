"""Experiment: two queries per packed-banded grid cell (+ r16 sweep point).

The packed kernel runs at ~20% of the VPU issue peak (vs the stream
kernel's 31.8%): one 64-bit lattice = ~16 vreg-ops in flight per step
against the ~40 a 4-issue/cycle VPU needs to cover latency. Query-pairing
on the STREAM kernel measured +0.9% (scripts/exp_banded_pair.py — Mosaic
did not exploit the extra chains), but the packed kernel is further under
the coverage bar, so re-test the hypothesis here: carry TWO queries' band
states per grid cell (grid's query axis halves; same stream loads serve
both, halving load traffic per scored column).

Run on the chip: python scripts/exp_banded_packed_pair.py [mix|garbage]
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

from bgsa_tpu.banded_ref import checkpoint_columns
from bgsa_tpu.benchutil import chain_of, filter_mix_dataset
from bgsa_tpu.ops import banded_packed as bp
from bgsa_tpu.ops import blockutil
from bgsa_tpu.ops.banded_packed import (_consts, _extract, _latch,
                                        _packed_update, _split64)

LANES = 128


def _pair_kernel(q_ref, stream_ref, out_ref, *, q_len, s_len, k, unroll):
    h, band_down, max_err, pitch, n_sub, band64, xsm64, ones64, tops64 = \
        _consts(q_len, s_len, k)
    R, L = stream_ref.shape[-2], stream_ref.shape[-1]
    tile = (R, L)
    consts = (*_split64(band64), *_split64(xsm64), *_split64(ones64))
    top_lo, top_hi = _split64(tops64)
    bandmask32 = jnp.uint32((1 << (band_down + 1)) - 1)

    def eq_window(t, c):
        w = t // 32
        b = jnp.asarray(t % 32).astype(jnp.uint32)
        wins = [bp.funnel_window(stream_ref[j, c, w], stream_ref[j, c, w + 1],
                                 b, bandmask32) for j in range(n_sub)]
        return bp.fold_window_fields(wins, pitch, band_down,
                                     jnp.zeros(tile, jnp.uint32))

    def column2(t, sa, sb, scored=True):
        ea = eq_window(t, q_ref[0, 0, t])
        eb = eq_window(t, q_ref[1, 0, t])
        sa = _packed_update(sa, *ea, consts, scored)
        sb = _packed_update(sb, *eb, consts, scored)
        return sa, sb

    zeros = jnp.zeros(tile, jnp.uint32)
    sa = (zeros,) * 8
    sb = (zeros,) * 8

    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)
    BATCH_COLS = 32
    head_end = min(k, q_len)
    nb = max(0, (last_chk - head_end) // BATCH_COLS)

    for t in range(head_end):
        sa, sb = column2(t, sa, sb, scored=False)

    def batch_body(carry):
        i, sa, sb = carry
        base = head_end + i * BATCH_COLS

        def inner(j, st):
            sa, sb = st
            for u in range(unroll):
                sa, sb = column2(base + j * unroll + u, sa, sb)
            return sa, sb

        sa, sb = lax.fori_loop(0, BATCH_COLS // unroll, inner, (sa, sb))
        scored = (i + jnp.int32(1)) * BATCH_COLS
        thr = scored - jnp.int32(h + 1)
        sa = _latch(sa, thr, pitch, n_sub, tops64)
        sb = _latch(sb, thr, pitch, n_sub, tops64)
        return i + 1, sa, sb

    def batch_cond(carry):
        i, sa, sb = carry
        dead = jnp.all((sa[6] == top_lo) & (sa[7] == top_hi)
                       & (sb[6] == top_lo) & (sb[7] == top_hi))
        return jnp.logical_and(i < nb, jnp.logical_not(dead))

    _, sa, sb = lax.while_loop(batch_cond, batch_body, (jnp.int32(0), sa, sb))

    for t in range(head_end + nb * BATCH_COLS, q_len):
        sa, sb = column2(t, sa, sb)
        if t + 1 == last_chk:
            thr = jnp.int32(last_chk - k - h - 1)
            sa = _latch(sa, thr, pitch, n_sub, tops64)
            sb = _latch(sb, thr, pitch, n_sub, tops64)

    for qi, st in ((0, sa), (1, sb)):
        vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = st
        for j in range(n_sub):
            o = pitch * j
            matches = _extract(mlo, mhi, o, pitch).astype(jnp.int32)
            err = jnp.int32(q_len) - matches
            cur = err
            mn = err
            for i in range(h + 1):
                vp = _extract(vplo, vphi, o + i, 1)
                vn = _extract(vnlo, vnhi, o + i, 1)
                cur = cur + vp.astype(jnp.int32) - vn.astype(jnp.int32)
                mn = jnp.minimum(mn, cur)
            dead = _extract(dlo, dhi, o + pitch - 1, 1)
            out_ref[qi, j] = jnp.where(dead > 0, jnp.int32(127), mn)


@functools.partial(
    jax.jit, static_argnames=("q_len", "s_len", "k", "rows_per_block", "unroll"))
def banded_packed_pair(streams, queries, *, q_len, s_len, k,
                       rows_per_block=64, unroll=16):
    n_sub = bp.packed_subbands(q_len, s_len, k)
    NS, C, W, S_sub = streams.shape
    Q, m = queries.shape
    assert Q % 2 == 0
    rows = S_sub // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nbk = rows_p // r
    streams5 = blockutil.pad_rows(
        streams.reshape(n_sub, C, W, rows, LANES), 3, rows_p)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, q_len=q_len, s_len=s_len, k=k,
                          unroll=unroll),
        grid=(nbk, Q // 2),
        in_specs=[
            pl.BlockSpec((2, 1, m), lambda b, q: (q, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_sub, C, W, r, LANES), lambda b, q: (0, 0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((2, n_sub, r, LANES), lambda b, q: (q, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, n_sub, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=25 * Q * m * n_sub * S_sub,
            bytes_accessed=streams.size * 4, transcendentals=0),
    )(jnp.asarray(queries, jnp.int32)[:, None, :], streams5)
    return out[:, :, :rows].reshape(Q, n_sub * rows * LANES)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "mix"
    rng = np.random.default_rng(13)
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

    print(f"[{kind}] gate ...", file=sys.stderr)
    want = np.asarray(bp.banded_stream_packed(streams, qd, **kw))
    got = np.asarray(banded_packed_pair(streams, qd, **kw))
    assert (want == got).all(), f"MISMATCH {np.argwhere(want != got)[:5]}"
    print("bit-exact", file=sys.stderr)

    variants = {
        "packed_r64u16": lambda q: bp.banded_stream_packed(streams, q, **kw),
        "packed_r16u16": lambda q: bp.banded_stream_packed(
            streams, q, rows_per_block=16, **kw),
        "pair_r64u16": lambda q: banded_packed_pair(streams, q, **kw),
        "pair_r32u16": lambda q: banded_packed_pair(
            streams, q, rows_per_block=32, **kw),
    }
    samples = {}
    for name, run in variants.items():
        print(f"compile {name}", file=sys.stderr)
        samples[name] = chain_of(run, qd, 24)
        samples[name]()
    times = {name: [] for name in samples}
    for rep in range(8):
        for name, sm in samples.items():
            t0 = time.perf_counter(); sm(); times[name].append(time.perf_counter() - t0)
        print(f"rep {rep + 1}/8", file=sys.stderr)
    cells = Q * m * S * m * 24
    rates = {n: cells / statistics.median(t) / 1e9 for n, t in times.items()}
    base = rates["packed_r64u16"]
    for n, r in sorted(rates.items(), key=lambda kv: -kv[1]):
        print(f"{n:14s}: {r:6.0f} GCUPS billed = "
              f"{r * 1e9 / m / m / 1e6:5.0f} M align/s  ({r / base - 1:+.1%})")


if __name__ == "__main__":
    main()
