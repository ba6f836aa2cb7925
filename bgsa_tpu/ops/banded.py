"""Banded Myers verification kernel (error threshold k), XLA + Pallas TPU.

TPU-native re-design of the reference's banded family
(``banded/BGSA_CPU/align_core.c:19-253``; semantics documented in
``bgsa_tpu.banded_ref``). Key mapping decisions:

* The reference's 64-bit band register is emulated as (lo, hi) uint32 pairs —
  the band's above-band carry dynamics are word-size-dependent, so matching
  the reference bit-for-bit requires 64-bit arithmetic (measured: 16% of
  scores diverge if the band is truncated to 32 bits). This also supports
  bands up to 64 bits (k up to ~31 at equal lengths).
* The reference's ``goto end`` early termination becomes a per-lane dead
  mask latched at the precomputed checkpoint columns (the scalar reference's
  schedule, ``banded_ref.checkpoint_columns``); dead lanes report
  MAX_ERROR=127. Early exit as *control flow* would diverge across lanes; as
  masking it is branch-free and still exact.
* Two kernel strategies: ``banded_stream`` (the fast path) *loads* each
  column's 64-bit Eq window from a static per-character bit-stream with a
  funnel shift (pack.pack_banded_stream_jax) — no loop-carried Peq planes at
  all; ``banded`` carries the sliding Peq window like the reference (shift +
  inject per column) and covers the s_len < q_len geometries the stream view
  cannot represent.
* Where the band is narrow enough (band_down <= 30, s_len >= q_len), the
  engine routes past this module to ``ops.banded_packed`` — the
  subject-interleaved kernel packing n_sub = 64 // (band_down + 2)
  subjects' bands per register pair (+26% at the k=8/150bp headline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..banded_ref import MAX_ERROR, checkpoint_columns
from . import blockutil

LANES = 128


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _shr1(lo, hi):
    return (lo >> 1) | (hi << 31), hi >> 1


def _select_plane(planes, c):
    """planes[c] for a traced scalar c, via a select chain (the Mosaic TPU
    lowering does not support dynamic_slice on loop-carried values)."""
    out = planes[0]
    for i in range(1, planes.shape[0]):
        out = jnp.where(c == i, planes[i], out)
    return out


def _banded_column(t, state, c, inj_bits, *, k, m, band_down, max_err, chk):
    """One query column. state tuple of jnp arrays; c traced char; inj_bits
    (5, ...) uint32 0/1 injection bits for this column; chk traced 0/1."""
    plo, phi, vplo, vphi, vnlo, vnhi, err, dead = state
    one = jnp.uint32(1)

    eq_lo = _select_plane(plo, c)
    eq_hi = _select_plane(phi, c)
    xlo, xhi = eq_lo | vnlo, eq_hi | vnhi
    tlo, thi = xlo & vplo, xhi & vphi
    slo, shi = _add64(tlo, thi, vplo, vphi)
    d0lo = (slo ^ vplo) | xlo
    d0hi = (shi ^ vphi) | xhi
    hnlo, hnhi = d0lo & vplo, d0hi & vphi
    hplo, hphi = ~(d0lo | vplo) | vnlo, ~(d0hi | vphi) | vnhi
    xslo, xshi = _shr1(d0lo, d0hi)
    vnlo, vnhi = xslo & hplo, xshi & hphi
    vplo, vphi = ~(hplo | xslo) | hnlo, ~(hphi | xshi) | hnhi

    scored = (t >= k).astype(jnp.int32)
    err = err + scored * (jnp.int32(1) - (d0lo & one).astype(jnp.int32))

    plo, phi = _shr1(plo, phi)  # move_peq over all 5 planes at once
    inject = jnp.where(t < m - k, jnp.uint32(1), jnp.uint32(0))
    bits = inj_bits * inject
    if band_down < 32:
        plo = plo | (bits << band_down)
    else:
        phi = phi | (bits << (band_down - 32))

    dead = dead | (chk & (err > jnp.int32(max_err)).astype(jnp.int32))
    return plo, phi, vplo, vphi, vnlo, vnhi, err, dead


def _epilogue(state, *, h, read_len_unused=None):
    _, _, vplo, vphi, vnlo, vnhi, err, dead = state
    one = jnp.uint32(1)
    mn = err
    cur = err
    for i in range(h + 1):
        vp_bit = (vplo >> i) & one if i < 32 else (vphi >> (i - 32)) & one
        vn_bit = (vnlo >> i) & one if i < 32 else (vnhi >> (i - 32)) & one
        cur = cur + vp_bit.astype(jnp.int32) - vn_bit.astype(jnp.int32)
        mn = jnp.minimum(mn, cur)
    return jnp.where(dead > 0, jnp.int32(MAX_ERROR), mn)


def _geometry(q_len: int, s_len: int, k: int):
    h = k + s_len - q_len
    if h < 0:
        raise ValueError("banded requires subject_len >= query_len - threshold")
    band_length = k + h + 1
    if band_length > 64:
        raise ValueError(f"band of {band_length} bits exceeds the 64-bit register")
    if k + min(k, s_len) > 63:
        # The initial Peq window holds subject[0..k-1] at bits k+1..2k
        # (banded/BGSA_CPU/global.c:27-85); past bit 63 the packers cannot
        # carry it and the reference's own C is shift-count UB there. Only
        # reachable for s_len < q_len (s_len >= q_len implies 2k < band <= 64).
        raise ValueError(
            f"banded preload needs bit {k + min(k, s_len)} (> 63): threshold "
            f"{k} with {s_len}bp subjects exceeds the 64-bit band register "
            "(undefined in the reference too); reduce -k or use full Myers"
        )
    return h, band_length - 1, k + h + 1  # h, band_down, max_err


def _chk_array(q_len: int, s_len: int, k: int) -> np.ndarray:
    cols = checkpoint_columns(q_len, s_len, k)
    chk = np.zeros(q_len, np.int32)
    for c in cols:
        if 1 <= c <= q_len:
            chk[c - 1] = 1  # check happens after column c (0-based t = c-1)
    return chk


@functools.partial(jax.jit, static_argnames=("q_len", "s_len", "k"))
def banded_xla(init_lo, init_hi, inj, queries, *, q_len: int, s_len: int, k: int):
    """Portable backend. init_* (5, S) uint32, inj (5, W, S) uint32,
    queries (Q, m) int32 -> (Q, S) int32 scores (127 = early exit)."""
    h, band_down, max_err = _geometry(q_len, s_len, k)
    S = init_lo.shape[1]
    W = inj.shape[1]
    chk = jnp.asarray(_chk_array(q_len, s_len, k))
    inj_w_major = jnp.transpose(inj, (1, 0, 2))  # (W, 5, S)

    def one_query(query):
        def step(state, inputs):
            t, c = inputs
            w = jnp.minimum(t // 32, W - 1)
            word = lax.dynamic_index_in_dim(inj_w_major, w, 0, keepdims=False)
            bits = (word >> (t % 32).astype(jnp.uint32)) & jnp.uint32(1)
            state = _banded_column(
                t, state, c, bits, k=k, m=q_len, band_down=band_down,
                max_err=max_err, chk=chk[t],
            )
            return state, None

        zeros = jnp.zeros((S,), jnp.uint32)
        state = (
            init_lo, init_hi, zeros, zeros, zeros, zeros,
            jnp.full((S,), k, jnp.int32), jnp.zeros((S,), jnp.int32),
        )
        ts = jnp.arange(q_len)
        state, _ = lax.scan(step, state, (ts, query))
        return _epilogue(state, h=h)

    return jax.vmap(one_query)(queries)


def _kernel(q_ref, chk_ref, init_lo_ref, init_hi_ref, inj_ref, out_ref, *,
             q_len, s_len, k):
    h, band_down, max_err = _geometry(q_len, s_len, k)
    W = inj_ref.shape[0]
    R, L = init_lo_ref.shape[1], init_lo_ref.shape[2]
    tile = (R, L)

    def column(t, state):
        c = q_ref[0, 0, t]
        w = jnp.minimum(t // 32, W - 1)
        word = inj_ref[w]  # (5, R, L)
        bits = (word >> (t % 32).astype(jnp.uint32)) & jnp.uint32(1)
        return _banded_column(
            t, state, c, bits, k=k, m=q_len, band_down=band_down,
            max_err=max_err, chk=chk_ref[0, 0, t],
        )

    zeros = jnp.zeros(tile, jnp.uint32)
    state = (
        init_lo_ref[...], init_hi_ref[...], zeros, zeros, zeros, zeros,
        jnp.full(tile, k, jnp.int32), jnp.zeros(tile, jnp.int32),
    )
    # Whole-block early exit (the reference's goto, lifted to block scope):
    # run full 32-column batches under a while_loop whose condition also
    # checks "every lane dead"; the ragged tail runs unconditionally after.
    # Dead lanes report MAX_ERROR regardless, so this changes no output
    # (and the skipped middle batches can't change live lanes — there are
    # none when the loop exits early).
    BATCH_COLS = 32
    n_batches = q_len // BATCH_COLS
    # pseudo-checkpoints: err is monotone, so latching dead at any batch
    # boundary <= the last reference checkpoint is outcome-neutral (the
    # checkpoint would catch the lane anyway) and lets blocks exit earlier.
    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)

    def batch_cond(carry):
        b, state = carry
        return jnp.logical_and(b < n_batches, jnp.logical_not(jnp.all(state[7] > 0)))

    def batch_body(carry):
        b, state = carry
        base = b * BATCH_COLS
        # 4-column unroll inside the batch (see docs/PERF.md).
        UNROLL = 4

        def inner(i, st):
            for u in range(UNROLL):
                st = column(base + i * UNROLL + u, st)
            return st

        state = lax.fori_loop(0, BATCH_COLS // UNROLL, inner, state)
        mark = ((b + 1) * BATCH_COLS <= jnp.int32(last_chk)).astype(jnp.int32)
        dead = state[7] | (mark & (state[6] > jnp.int32(max_err)).astype(jnp.int32))
        return b + 1, state[:7] + (dead,)

    _, state = lax.while_loop(batch_cond, batch_body, (jnp.int32(0), state))
    state = lax.fori_loop(n_batches * BATCH_COLS, q_len, column, state)
    out_ref[0] = _epilogue(state, h=h)


def _band_update(t, state, eq_lo, eq_hi, *, k, max_err, chk):
    """Myers band recurrence on a loaded 64-bit Eq window (shared by the
    single- and dual-stream kernels)."""
    vplo, vphi, vnlo, vnhi, err, dead = state
    one = jnp.uint32(1)

    xlo, xhi = eq_lo | vnlo, eq_hi | vnhi
    tlo, thi = xlo & vplo, xhi & vphi
    slo, shi = _add64(tlo, thi, vplo, vphi)
    d0lo = (slo ^ vplo) | xlo
    d0hi = (shi ^ vphi) | xhi
    hnlo, hnhi = d0lo & vplo, d0hi & vphi
    hplo, hphi = ~(d0lo | vplo) | vnlo, ~(d0hi | vphi) | vnhi
    xslo, xshi = _shr1(d0lo, d0hi)
    vnlo, vnhi = xslo & hplo, xshi & hphi
    vplo, vphi = ~(hplo | xslo) | hnlo, ~(hphi | xshi) | hnhi

    # jnp.asarray: t (and so t >= k) is a Python scalar when called from the
    # dual head's static remainder loop, a tracer everywhere else
    scored = jnp.asarray(t >= k).astype(jnp.int32)
    err = err + scored * (jnp.int32(1) - (d0lo & one).astype(jnp.int32))
    dead = dead | (chk & (err > jnp.int32(max_err)).astype(jnp.int32))
    return vplo, vphi, vnlo, vnhi, err, dead


def _stream_column(t, state, c, load, *, k, m, band_down, max_err, chk):
    """One query column, Eq window loaded from the packed bit-stream via
    ``load(c, w)`` with a funnel shift — replaces the loop-carried Peq planes
    (their per-column shift + inject + 5-way select chain was ~60% of the
    column's vector ops).

    Window bits above band_down are masked off: in the stream view they hold
    *future* injections, which the reference's register (inject-at-band_down,
    then shift right) cannot contain yet. Valid when no preload content can
    appear above the band at column t — i.e. h >= k (banded_stream), or
    t > 2k in the dual-stream kernel (B plane only).
    """
    w = t // 32
    # jnp.asarray: t is a tracer from the fori_loop bodies but a plain
    # Python int from the dual head's static remainder loop
    b = jnp.asarray(t % 32).astype(jnp.uint32)
    b0 = load(c, w)
    b1 = load(c, w + 1)
    # (x << (32 - b)) written as two static-bounded shifts so b == 0 yields 0.
    eq_lo = (b0 >> b) | ((b1 << (jnp.uint32(31) - b)) << 1)
    if band_down < 32:
        eq_lo = eq_lo & jnp.uint32((1 << (band_down + 1)) - 1)
        eq_hi = jnp.zeros_like(eq_lo)
    else:
        b2 = load(c, w + 2)
        eq_hi = (b1 >> b) | ((b2 << (jnp.uint32(31) - b)) << 1)
        if band_down < 63:
            eq_hi = eq_hi & jnp.uint32((1 << (band_down - 31)) - 1)
    return _band_update(t, state, eq_lo, eq_hi, k=k, max_err=max_err, chk=chk)


def _stream2_column(t, state, c, load_a, load_b, *, k, m, band_down, max_err, chk):
    """One query column for ``s_len < q_len`` (h < k): the window combines
    two funnel-loaded streams (pack.pack_banded_streams_jax) —

        register(t, j) = A[t + j] | (B[t + j] & (j <= band_down))

    A (preload) is present at every height from column 0 exactly like the
    reference's pre-shifted word 0; B (injections) only becomes real once the
    column's injection has happened, i.e. at heights <= band_down. A is
    empty beyond stream position 2k, so the dual load is only needed for
    columns t <= 2k — the kernel switches to _stream_column(B) after.
    """
    w = t // 32
    # jnp.asarray: t is a tracer from the fori_loop bodies but a plain
    # Python int from the dual head's static remainder loop
    b = jnp.asarray(t % 32).astype(jnp.uint32)

    def funnel(p0, p1):
        return (p0 >> b) | ((p1 << (jnp.uint32(31) - b)) << 1)

    a0 = load_a(c, w)
    a1 = load_a(c, w + 1)
    eq_lo = funnel(a0, a1)
    if 2 * k >= 32:  # preload can sit above bit 31 (heights up to 2k)
        eq_hi = funnel(a1, load_a(c, w + 2))
    else:
        eq_hi = jnp.zeros_like(eq_lo)
    i0 = load_b(c, w)
    i1 = load_b(c, w + 1)
    blo = funnel(i0, i1)
    if band_down < 32:
        eq_lo = eq_lo | (blo & jnp.uint32((1 << (band_down + 1)) - 1))
    else:
        eq_lo = eq_lo | blo
        bhi = funnel(i1, load_b(c, w + 2))
        if band_down < 63:
            bhi = bhi & jnp.uint32((1 << (band_down - 31)) - 1)
        eq_hi = eq_hi | bhi
    return _band_update(t, state, eq_lo, eq_hi, k=k, max_err=max_err, chk=chk)


def _stream_kernel(q_ref, chk_ref, stream_ref, out_ref, *, q_len, s_len, k, unroll,
                   dual: bool = False, block_exit: bool = True):
    h, band_down, max_err = _geometry(q_len, s_len, k)
    R, L = stream_ref.shape[-2], stream_ref.shape[-1]
    tile = (R, L)
    kw = dict(k=k, m=q_len, band_down=band_down, max_err=max_err)

    if dual:
        load_a = lambda c, w: stream_ref[0, c, w]  # noqa: E731
        load_b = lambda c, w: stream_ref[1, c, w]  # noqa: E731

        def column2(t, state):
            return _stream2_column(
                t, state, q_ref[0, 0, t], load_a, load_b,
                chk=chk_ref[0, 0, t], **kw,
            )
    else:
        load_b = lambda c, w: stream_ref[c, w]  # noqa: E731

    def column(t, state):
        return _stream_column(
            t, state, q_ref[0, 0, t], load_b, chk=chk_ref[0, 0, t], **kw
        )

    zeros = jnp.zeros(tile, jnp.uint32)
    state = (zeros, zeros, zeros, zeros,
             jnp.full(tile, k, jnp.int32), jnp.zeros(tile, jnp.int32))

    BATCH_COLS = 32
    n_batches = q_len // BATCH_COLS
    # err is monotone nondecreasing, so a lane with err > max_err at any
    # column <= the last reference checkpoint is caught by that checkpoint
    # regardless — latching dead at every batch boundary changes no output
    # but lets whole blocks exit at column 32 instead of the reference's
    # first check at column 64 (~2x on all-garbage filter blocks).
    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)

    # Dual head: the A (preload) stream is empty past position 2k, so only
    # columns t <= 2k need the dual load; the rest runs the cheaper B-only
    # column. The head skips the whole-block early exit (the reference's
    # first checkpoint is at column min(64, q_len) anyway; per-lane dead
    # latching still happens inside the column).
    start_batch = 0
    if dual:
        start_batch = min(-(-(2 * k + 1) // BATCH_COLS), n_batches)
        head_end = min(max(start_batch * BATCH_COLS, 2 * k + 1), q_len)

        def head_inner(j, st):
            for u in range(unroll):
                st = column2(j * unroll + u, st)
            return st

        state = lax.fori_loop(0, head_end // unroll, head_inner, state)
        for t in range((head_end // unroll) * unroll, head_end):
            state = column2(t, state)
        # head_end exceeds start_batch*32 only when start_batch was capped
        # at n_batches; the while_loop is then empty and the static tail
        # below resumes at head_end.

    # Whole-block early exit over unrolled batches (see _kernel).
    def batch_cond(carry):
        i, state = carry
        return jnp.logical_and(i < n_batches, jnp.logical_not(jnp.all(state[5] > 0)))

    def batch_body(carry):
        i, state = carry
        base = i * BATCH_COLS

        def inner(j, st):
            for u in range(unroll):
                st = column(base + j * unroll + u, st)
            return st

        state = lax.fori_loop(0, BATCH_COLS // unroll, inner, state)
        # pseudo-checkpoint at the batch boundary (outcome-neutral, above)
        vplo, vphi, vnlo, vnhi, err, dead = state
        mark = ((i + 1) * BATCH_COLS <= jnp.int32(last_chk)).astype(jnp.int32)
        dead = dead | (mark & (err > jnp.int32(max_err)).astype(jnp.int32))
        return i + 1, (vplo, vphi, vnlo, vnhi, err, dead)

    if block_exit:
        _, state = lax.while_loop(
            batch_cond, batch_body, (jnp.int32(start_batch), state)
        )
    else:
        # A/B control (docs/PERF.md): identical batches, no early-exit
        # condition — isolates the while_loop's cost/benefit.
        state = lax.fori_loop(
            jnp.int32(start_batch), jnp.int32(n_batches),
            lambda i, st: batch_body((i, st))[1], state,
        )
    tail_start = n_batches * BATCH_COLS
    if dual:
        tail_start = max(tail_start, head_end)
    state = lax.fori_loop(tail_start, q_len, column, state)
    # _epilogue expects the 8-tuple layout; prepend dummy plane slots.
    out_ref[0] = _epilogue((None, None) + state, h=h)


@functools.partial(
    jax.jit,
    static_argnames=("q_len", "s_len", "k", "rows_per_block", "unroll",
                     "interpret", "block_exit"),
)
def banded_stream(stream, queries, *, q_len: int, s_len: int, k: int,
                  rows_per_block: int = 64, unroll: int | None = None,
                  interpret: bool = False, block_exit: bool = True):
    """Pallas TPU backend on the flat Eq bit-stream (the fast path).

    stream: (5, W, S) uint32 from pack.pack_banded_stream_jax; S % 128 == 0.
    Returns (Q, S) int32 scores (127 = early exit). Output is bit-identical
    to banded()/banded_xla().

    Defaults (r64, u16) re-tuned against true device time once the remote
    tunnel's ~25 ms/dispatch floor was discovered and excluded (docs/PERF.md
    "The dispatch floor"): 219-251 M align/s on the 150 bp k=8 filter, vs
    195-242 for the floored-era r32/u4.
    """
    C, W, S = stream.shape
    Q, m = queries.shape
    if unroll is None:  # tuned default; 1 in interpret mode (tests crawl otherwise)
        unroll = 1 if interpret else 16
    h, _, _ = _geometry(q_len, s_len, k)  # validate band
    if h < k:
        raise ValueError(
            "banded_stream requires s_len >= q_len (the preload would exceed "
            "the band); use banded()/banded_xla() for shorter subjects"
        )
    if S % LANES:
        raise ValueError(f"subject count {S} must be a multiple of {LANES}")
    rows = S // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nb = rows_p // r

    chk = np.zeros((1, 1, m), np.int32)
    chk[0, 0] = _chk_array(q_len, s_len, k)
    stream4 = blockutil.pad_rows(stream.reshape(C, W, rows, LANES), 2, rows_p)

    out = pl.pallas_call(
        functools.partial(
            _stream_kernel, q_len=q_len, s_len=s_len, k=k,
            block_exit=block_exit,
            # batch body covers 32 columns; a non-divisor unroll would skip
            # the batch tail, so round down to a divisor {1,2,4,8,16,32}
            unroll=max(u for u in (1, 2, 4, 8, 16, 32)
                       if u <= max(1, min(unroll, 32))),
        ),
        grid=(nb, Q),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda b, q: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, W, r, LANES), lambda b, q: (0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=40 * Q * m * S, bytes_accessed=stream.size * 4 + Q * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(queries, jnp.int32)[:, None, :], jnp.asarray(chk), stream4)
    return out[:, :rows].reshape(Q, S)


@functools.partial(
    jax.jit, static_argnames=("q_len", "s_len", "k", "rows_per_block", "unroll", "interpret")
)
def banded_stream_dual(streams, queries, *, q_len: int, s_len: int, k: int,
                       rows_per_block: int = 32, unroll: int | None = None,
                       interpret: bool = False):
    """Pallas TPU backend for ``s_len < q_len`` on dual Eq bit-streams.

    streams: (2, 5, W, S) uint32 from pack.pack_banded_streams_jax; S % 128
    == 0. Returns (Q, S) int32 scores (127 = early exit), bit-identical to
    banded()/banded_xla(). Covers h < k, where the single flat stream is
    unsound (early injections collide with preload positions); for
    s_len >= q_len use banded_stream (one fewer funnel load per column).
    """
    two, C, W, S = streams.shape
    Q, m = queries.shape
    if unroll is None:  # tuned default; 1 in interpret mode (tests crawl otherwise)
        unroll = 1 if interpret else 4
    _geometry(q_len, s_len, k)  # validate band
    if 2 * k > 63:
        # The preload spans bits k+1..2k; past bit 63 it exceeds the 64-bit
        # window (the reference's register drops those bits too — UB in its
        # C: shift count >= 64). The engine falls back to the Peq-carry
        # kernel for this corner.
        raise ValueError(
            "banded_stream_dual requires 2k <= 63 (preload must fit the "
            "64-bit window); use banded()/banded_xla()"
        )
    if S % LANES:
        raise ValueError(f"subject count {S} must be a multiple of {LANES}")
    rows = S // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nb = rows_p // r

    chk = np.zeros((1, 1, m), np.int32)
    chk[0, 0] = _chk_array(q_len, s_len, k)
    streams4 = blockutil.pad_rows(streams.reshape(2, C, W, rows, LANES), 3, rows_p)

    out = pl.pallas_call(
        functools.partial(
            _stream_kernel, q_len=q_len, s_len=s_len, k=k, dual=True,
            unroll=max(u for u in (1, 2, 4, 8, 16, 32)
                       if u <= max(1, min(unroll, 32))),
        ),
        grid=(nb, Q),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda b, q: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, C, W, r, LANES), lambda b, q: (0, 0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=50 * Q * m * S, bytes_accessed=streams.size * 4 + Q * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(queries, jnp.int32)[:, None, :], jnp.asarray(chk), streams4)
    return out[:, :rows].reshape(Q, S)


@functools.partial(
    jax.jit, static_argnames=("q_len", "s_len", "k", "rows_per_block", "interpret")
)
def banded(init_lo, init_hi, inj, queries, *, q_len: int, s_len: int, k: int,
           rows_per_block: int = 32, interpret: bool = False):
    """Pallas TPU backend; S % 128 == 0. Returns (Q, S) int32 scores."""
    C, S = init_lo.shape
    Q, m = queries.shape
    W = inj.shape[1]
    if S % LANES:
        raise ValueError(f"subject count {S} must be a multiple of {LANES}")
    rows = S // LANES
    r, rows_p = blockutil.choose_rows(rows, rows_per_block)
    nb = rows_p // r

    chk = np.zeros((1, 1, m), np.int32)
    chk[0, 0] = _chk_array(q_len, s_len, k)
    init_lo4 = blockutil.pad_rows(init_lo.reshape(C, rows, LANES), 1, rows_p)
    init_hi4 = blockutil.pad_rows(init_hi.reshape(C, rows, LANES), 1, rows_p)
    inj4 = blockutil.pad_rows(
        jnp.transpose(inj, (1, 0, 2)).reshape(W, C, rows, LANES), 2, rows_p
    )

    out = pl.pallas_call(
        functools.partial(_kernel, q_len=q_len, s_len=s_len, k=k),
        grid=(nb, Q),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m), lambda b, q: (0, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, r, LANES), lambda b, q: (0, b, 0)),
            pl.BlockSpec((C, r, LANES), lambda b, q: (0, b, 0)),
            pl.BlockSpec((W, C, r, LANES), lambda b, q: (0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=50 * Q * m * S, bytes_accessed=inj.size * 4 + Q * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(queries, jnp.int32)[:, None, :], jnp.asarray(chk),
      init_lo4, init_hi4, inj4)
    return out[:, :rows].reshape(Q, S)
