"""Subject-interleaved packed banded kernel (Pallas TPU + XLA twin).

The banded stream kernel (ops/banded.py) spends a 64-bit register pair per
subject on a band of only ``band_length = 2k + s_len - q_len + 1`` live bits
(17 at the k=8/150bp headline geometry) — 31.8% of the VPU issue peak on the
round-4 roofline, with every cheap bottleneck hypothesis refuted
(scripts/exp_banded_pair.py). This module takes the one remaining
algorithmic lever: pack ``n_sub = 64 // (band_length + 1)`` subjects' bands
into each (lo, hi) uint32 pair at pitch ``band_length + 1`` (one guard bit
per field absorbs the add's carry), cutting vector ops per cell ~2x.

Packing is BYTE-EXACT against the reference (banded/BGSA_CPU/align_core.c,
which runs the recurrence over a full 64-bit register): masking D0 to the
band before the Xs shift reproduces the 64-bit dynamics bit-for-bit.
Proof sketch (scripts/exp_banded_packed_model.py, validated over 680k pairs
incl. band-edge adversaries with millions of carry-out columns): with Eq
empty above the band, VP/VN stay empty above the band except that the
in-band add's carry-out re-enters via ``Xs`` at band_down; carry-out
requires VP = 1 and forces D0 = 1 at band_down, hence HP = 0 and HN = 1
there, which makes VP'/VN' at band_down independent of the injected bit.
So injecting 0 (the field truncation) equals injecting the reference's
carry bit, always.

Early-exit parity uses monotonicity instead of the per-column checkpoint
array: ``err`` is nondecreasing, so the reference's "err > max_err at ANY
checkpoint" equals "err > max_err at the LAST checkpoint"
(banded_ref.checkpoint_columns); the kernel latches per-field dead flags at
batch boundaries <= last_chk (outcome-neutral pseudo-checkpoints, same
argument as ops/banded.py) plus exactly at last_chk in the static tail.

Error counting is SWAR: per-field match counts accumulate at the band pitch
(``matches < 2**(pitch-1)`` guaranteed by the eligibility gate), and
``err = k + scored - matches > max_err`` becomes a packed compare
``matches < scored - h - 1`` via the top-bit subtraction trick.
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
from .banded import _geometry

LANES = 128


def packed_subbands(q_len: int, s_len: int, k: int) -> int:
    """Sub-bands per 64-bit pair for this geometry; 0 when packing does not
    apply (shorter-subject geometry, fat bands, or match-count overflow)."""
    h = k + s_len - q_len
    if h < 0 or h < k:
        return 0  # needs the single-stream geometry (preload inside band)
    band_down = k + h
    if band_down + 1 > 64:
        return 0
    pitch = band_down + 2  # band bits 0..band_down + 1 guard bit
    n_sub = 64 // pitch
    if n_sub < 2:
        return 0  # no denser than the plain stream kernel
    if q_len >= 1 << (pitch - 1):
        return 0  # matches counter would overflow its field
    return n_sub


def _split64(x: int) -> tuple[jnp.uint32, jnp.uint32]:
    return jnp.uint32(x & 0xFFFFFFFF), jnp.uint32((x >> 32) & 0xFFFFFFFF)


def _consts(q_len: int, s_len: int, k: int):
    h, band_down, max_err = _geometry(q_len, s_len, k)
    pitch = band_down + 2
    n_sub = 64 // pitch
    band = 0
    xsm = 0
    ones = 0
    tops = 0
    for j in range(n_sub):
        o = pitch * j
        band |= ((1 << (band_down + 1)) - 1) << o
        xsm |= ((1 << band_down) - 1) << o
        ones |= 1 << o
        tops |= 1 << (o + pitch - 1)
    return h, band_down, max_err, pitch, n_sub, band, xsm, ones, tops


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    return lo, ahi + bhi + carry


def _sub64(alo, ahi, blo, bhi):
    borrow = (alo < blo).astype(jnp.uint32)
    return alo - blo, ahi - bhi - borrow


def _shr1(lo, hi):
    return (lo >> 1) | (hi << 31), hi >> 1


def _field_bits(thr, pitch: int, n_sub: int):
    """Broadcast a (possibly traced) scalar < 2**(pitch-1) into every field
    of a (lo, hi) pair — scalar shifts only."""
    thr = thr.astype(jnp.uint32) if hasattr(thr, "astype") else jnp.uint32(thr)
    lo = jnp.uint32(0)
    hi = jnp.uint32(0)
    for j in range(n_sub):
        o = pitch * j
        if o < 32:
            lo = lo | (thr << o)
            if o + pitch - 1 >= 32 and o:
                hi = hi | (thr >> (32 - o))
        else:
            hi = hi | (thr << (o - 32))
    return lo, hi


def _extract(lo, hi, offset: int, width: int):
    """Static per-field extraction from a (lo, hi) pair."""
    mask = jnp.uint32((1 << width) - 1)
    if offset == 0:
        word = lo
    elif offset < 32:
        word = (lo >> offset) | (hi << (32 - offset))
    else:
        word = hi >> (offset - 32)
    return word & mask


def funnel_window(b0, b1, b, bandmask32):
    """Bits [b, b+band] of the stream word pair (b0, b1) — the banded
    kernels' funnel shift, written as two static-bounded shifts so b == 0
    yields 0 from the high word."""
    return ((b0 >> b) | ((b1 << (jnp.uint32(31) - b)) << 1)) & bandmask32


def fold_window_fields(wins, pitch: int, band_down: int, zeros):
    """OR each chunk's band window into its packed field position of a
    (lo, hi) uint32 pair. Single definition shared by the Mosaic kernel,
    the XLA twin, and the roofline/experiment scripts — the committed op
    counts must describe the kernel that actually ships."""
    lo = zeros
    hi = zeros
    for j, win in enumerate(wins):
        o = pitch * j
        if o == 0:
            lo = win
        elif o < 32:
            lo = lo | (win << o)
            if o + band_down >= 32:
                hi = hi | (win >> (32 - o))
        else:
            hi = hi | (win << (o - 32))
    return lo, hi


def _packed_update(state, eqlo, eqhi, consts, scored: bool):
    (band_lo, band_hi, xsm_lo, xsm_hi, ones_lo, ones_hi) = consts
    vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = state
    xlo, xhi = eqlo | vnlo, eqhi | vnhi
    tlo, thi = xlo & vplo, xhi & vphi
    slo, shi = _add64(tlo, thi, vplo, vphi)
    d0lo = (slo ^ vplo) | xlo
    d0hi = (shi ^ vphi) | xhi
    hnlo, hnhi = d0lo & vplo, d0hi & vphi
    hplo = ~(d0lo | vplo) | vnlo
    hphi = ~(d0hi | vphi) | vnhi
    xslo, xshi = _shr1(d0lo & band_lo, d0hi & band_hi)
    xslo, xshi = xslo & xsm_lo, xshi & xsm_hi
    vnlo, vnhi = xslo & hplo, xshi & hphi
    vplo = (~(hplo | xslo) | hnlo) & band_lo
    vphi = (~(hphi | xshi) | hnhi) & band_hi
    if scored:
        mlo, mhi = _add64(mlo, mhi, d0lo & ones_lo, d0hi & ones_hi)
    return vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi


def _latch(state, thr, pitch: int, n_sub: int, tops64: int):
    """Latch per-field dead where err > max_err, i.e. matches < thr
    (thr = scored - h - 1; may be a traced scalar)."""
    vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = state
    top_lo, top_hi = _split64(tops64)
    tlo, thi = _field_bits(thr, pitch, n_sub)
    gelo, gehi = _sub64(mlo | top_lo, mhi | top_hi, tlo, thi)
    dlo = dlo | (~gelo & top_lo)
    dhi = dhi | (~gehi & top_hi)
    return vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi


def _packed_kernel(q_ref, stream_ref, out_ref, *, q_len, s_len, k, unroll,
                   block_exit: bool = True, static_cols: bool = False):
    h, band_down, max_err, pitch, n_sub, band64, xsm64, ones64, tops64 = \
        _consts(q_len, s_len, k)
    R, L = stream_ref.shape[-2], stream_ref.shape[-1]
    tile = (R, L)
    band_lo, band_hi = _split64(band64)
    consts = (band_lo, band_hi, *_split64(xsm64), *_split64(ones64))
    top_lo, top_hi = _split64(tops64)
    bandmask32 = jnp.uint32((1 << (band_down + 1)) - 1)

    def eq_window(t, c):
        w = t // 32
        b = jnp.asarray(t % 32).astype(jnp.uint32)
        wins = [
            funnel_window(stream_ref[j, c, w], stream_ref[j, c, w + 1],
                          b, bandmask32)
            for j in range(n_sub)
        ]
        return fold_window_fields(wins, pitch, band_down,
                                  jnp.zeros(tile, jnp.uint32))

    def column(t, state, scored=True):
        eqlo, eqhi = eq_window(t, q_ref[0, 0, t])
        return _packed_update(state, eqlo, eqhi, consts, scored)

    zeros = jnp.zeros(tile, jnp.uint32)
    state = (zeros,) * 8

    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)
    BATCH_COLS = 32
    head_end = min(k, q_len)
    nb = max(0, (last_chk - head_end) // BATCH_COLS)

    # Static head: the first k columns are unscored (banded_ref: err counts
    # from column k), which also keeps the matches accumulator aligned with
    # scored = t - k + 1.
    for t in range(head_end):
        state = column(t, state, scored=False)

    def batch_body(carry):
        i, state = carry
        base = head_end + i * BATCH_COLS

        def inner(j, st):
            for u in range(unroll):
                st = column(base + j * unroll + u, st)
            return st

        state = lax.fori_loop(0, BATCH_COLS // unroll, inner, state)
        # Pseudo-checkpoint at the batch boundary: err monotone + boundary
        # <= last_chk (by nb's construction) makes this outcome-neutral.
        scored = (i + jnp.int32(1)) * BATCH_COLS
        state = _latch(state, scored - jnp.int32(h + 1), pitch, n_sub, tops64)
        return i + 1, state

    def batch_cond(carry):
        i, state = carry
        all_dead = jnp.all((state[6] == top_lo) & (state[7] == top_hi))
        return jnp.logical_and(i < nb, jnp.logical_not(all_dead))

    if static_cols:
        # Fully static unrolling: every funnel-shift amount, window word and
        # latch position becomes a compile-time constant (no fori/while at
        # all), giving up the whole-block early exit. Measured and REJECTED
        # as a default (scripts/exp_banded_packed_static.py: +1.4-3.7% mix,
        # -10 to -11% garbage — unlike the stream kernel, where the same
        # surgery bought +11-15%; docs/PERF.md "Roofline"); kept as an A/B
        # probe. Outcome-neutral: the exit only skips columns whose fields
        # are all latched dead, and dead flags are sticky, so computing
        # them anyway changes no score. Latch points match the loop path's.
        for i in range(nb):
            base = head_end + i * BATCH_COLS
            for j in range(BATCH_COLS):
                state = column(base + j, state)
            state = _latch(state, jnp.int32((i + 1) * BATCH_COLS - h - 1),
                           pitch, n_sub, tops64)
    elif block_exit:
        _, state = lax.while_loop(batch_cond, batch_body, (jnp.int32(0), state))
    else:
        state = lax.fori_loop(
            jnp.int32(0), jnp.int32(nb),
            lambda i, st: batch_body((i, st))[1], state,
        )

    # Static tail covers [head_end + 32*nb, q_len), which contains last_chk.
    for t in range(head_end + nb * BATCH_COLS, q_len):
        state = column(t, state)
        if t + 1 == last_chk:
            state = _latch(state, jnp.int32(last_chk - k - h - 1),
                           pitch, n_sub, tops64)

    vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = state
    for j in range(n_sub):
        o = pitch * j
        matches = _extract(mlo, mhi, o, pitch).astype(jnp.int32)
        err = jnp.int32(q_len) - matches  # k + (q_len - k) - matches
        cur = err
        mn = err
        for i in range(h + 1):
            vp_bit = _extract(vplo, vphi, o + i, 1)
            vn_bit = _extract(vnlo, vnhi, o + i, 1)
            cur = cur + vp_bit.astype(jnp.int32) - vn_bit.astype(jnp.int32)
            mn = jnp.minimum(mn, cur)
        dead = _extract(dlo, dhi, o + pitch - 1, 1)
        out_ref[0, j] = jnp.where(dead > 0, jnp.int32(MAX_ERROR), mn)


@functools.partial(
    jax.jit,
    static_argnames=("q_len", "s_len", "k", "rows_per_block", "unroll",
                     "interpret", "block_exit", "static_cols"),
)
def banded_stream_packed(streams, queries, *, q_len: int, s_len: int, k: int,
                         rows_per_block: int = 64, unroll: int | None = None,
                         interpret: bool = False, block_exit: bool = True,
                         static_cols: bool = False):
    """Packed-field Pallas backend on per-chunk Eq bit-streams.

    streams: (n_sub, 5, W, S_sub) uint32 — pack.pack_banded_stream_jax per
    contiguous subject chunk (chunk j = subjects [j*S_sub, (j+1)*S_sub));
    S_sub % 128 == 0. Returns (Q, n_sub * S_sub) int32 scores in original
    subject order, bit-identical to banded_stream()/banded_xla().
    """
    n_sub = packed_subbands(q_len, s_len, k)
    NS, C, W, S_sub = streams.shape
    if n_sub < 2 or NS != n_sub:
        raise ValueError(
            f"geometry (q_len={q_len}, s_len={s_len}, k={k}) packs "
            f"{n_sub} sub-bands; got {NS} stream chunks"
        )
    Q, m = queries.shape
    if S_sub % LANES:
        raise ValueError(f"chunk subject count {S_sub} must be a multiple of {LANES}")
    if interpret and n_sub >= 5:
        # XLA CPU's algebraic simplifier livelocks ("circular simplification
        # loop", algebraic_simplifier.cc) on the inlined >=5-field eq/update/
        # epilogue network that interpret mode feeds it — the real Mosaic
        # path is unaffected (measured: n_sub=6 compiles in ~3 s on-chip,
        # bit-exact). Interpret-mode callers (tests) use banded_packed_xla
        # or an n_sub <= 4 geometry instead.
        raise ValueError(
            f"interpret mode supports n_sub <= 4 (got {n_sub}): the XLA CPU "
            "simplifier livelocks on wider packed networks; use "
            "banded_packed_xla for this geometry on CPU"
        )
    if interpret and static_cols:
        # The fully-static inline network is the HLO simplifier's worst
        # shape (CLAUDE.md: a static n_sub=3 m=32 step took > 600 s on the
        # CPU backend); the option is Mosaic-only.
        raise ValueError("static_cols is a Mosaic (on-chip) option; "
                         "interpret mode would livelock the XLA CPU simplifier")
    if unroll is None:
        unroll = 1 if interpret else 16
    rows = S_sub // LANES
    # VMEM: n_sub stream chunks + state; budget like the stream kernel.
    budget_rows = max((10 << 20) // (n_sub * C * W * LANES * 4), 1)
    r, rows_p = blockutil.choose_rows(rows, rows_per_block, budget_rows)
    nb = rows_p // r
    streams5 = blockutil.pad_rows(
        streams.reshape(n_sub, C, W, rows, LANES), 3, rows_p
    )

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, q_len=q_len, s_len=s_len, k=k,
            block_exit=block_exit, static_cols=static_cols,
            unroll=max(u for u in (1, 2, 4, 8, 16, 32)
                       if u <= max(1, min(unroll, 32))),
        ),
        grid=(nb, Q),
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_sub, C, W, r, LANES), lambda b, q: (0, 0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, n_sub, r, LANES), lambda b, q: (q, 0, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, n_sub, rows_p, LANES), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=25 * Q * m * n_sub * S_sub,
            bytes_accessed=streams.size * 4 + Q * n_sub * S_sub * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(queries, jnp.int32)[:, None, :], streams5)
    return out[:, :, :rows].reshape(Q, n_sub * rows * LANES)


@functools.partial(jax.jit, static_argnames=("q_len", "s_len", "k"))
def banded_packed_xla(streams, queries, *, q_len: int, s_len: int, k: int):
    """Portable twin of the packed kernel (same packed arithmetic via
    lax.scan; validates the field math on any backend)."""
    h, band_down, max_err, pitch, n_sub, band64, xsm64, ones64, tops64 = \
        _consts(q_len, s_len, k)
    NS, C, W, S_sub = streams.shape
    consts = (*_split64(band64), *_split64(xsm64), *_split64(ones64))
    top_lo, top_hi = _split64(tops64)
    bandmask32 = jnp.uint32((1 << (band_down + 1)) - 1)
    last_chk = max(checkpoint_columns(q_len, s_len, k), default=0)
    flat = jnp.transpose(streams, (2, 0, 1, 3))  # (W, n_sub, 5, S)

    def one_query(query):
        def step(state, inputs):
            t, c = inputs
            w = jnp.minimum(t // 32, W - 2)
            b = (t % 32).astype(jnp.uint32)
            w0 = lax.dynamic_index_in_dim(flat, w, 0, keepdims=False)
            w1 = lax.dynamic_index_in_dim(flat, w + 1, 0, keepdims=False)
            wins = [
                funnel_window(
                    lax.dynamic_index_in_dim(w0[j], c, 0, keepdims=False),
                    lax.dynamic_index_in_dim(w1[j], c, 0, keepdims=False),
                    b, bandmask32)
                for j in range(n_sub)
            ]
            lo, hi = fold_window_fields(wins, pitch, band_down,
                                        jnp.zeros((S_sub,), jnp.uint32))
            scored = t >= k
            vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = _packed_update(
                state, lo, hi, consts, scored=True)
            # un-count unscored head columns (scan has no static head)
            keep = scored.astype(jnp.uint32)
            mlo = state[4] + keep * (mlo - state[4])
            mhi = state[5] + keep * (mhi - state[5])
            state = (vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi)
            at_chk = (t + 1) == last_chk
            thr = jnp.int32(last_chk - k - h - 1)
            latched = _latch(state, thr, pitch, n_sub, tops64)
            gate = at_chk.astype(jnp.uint32)
            dlo = state[6] | (gate * latched[6])
            dhi = state[7] | (gate * latched[7])
            return state[:6] + (dlo, dhi), None

        zeros = jnp.zeros((S_sub,), jnp.uint32)
        state, _ = lax.scan(step, (zeros,) * 8,
                            (jnp.arange(q_len), query))
        vplo, vphi, vnlo, vnhi, mlo, mhi, dlo, dhi = state
        outs = []
        for j in range(n_sub):
            o = pitch * j
            matches = _extract(mlo, mhi, o, pitch).astype(jnp.int32)
            err = jnp.int32(q_len) - matches
            cur = err
            mn = err
            for i in range(h + 1):
                vp_bit = _extract(vplo, vphi, o + i, 1)
                vn_bit = _extract(vnlo, vnhi, o + i, 1)
                cur = cur + vp_bit.astype(jnp.int32) - vn_bit.astype(jnp.int32)
                mn = jnp.minimum(mn, cur)
            dead = _extract(dlo, dhi, o + pitch - 1, 1)
            outs.append(jnp.where(dead > 0, jnp.int32(MAX_ERROR), mn))
        return jnp.concatenate(outs)

    return jax.vmap(one_query)(queries)


def pack_packed_streams_jax(codes, threshold: int, query_len: int, n_sub: int):
    """Chunked Eq bit-streams for the packed kernel (device-side).

    codes (S, L) int32 with S % (n_sub * 128) == 0; returns
    (n_sub, 5, W, S // n_sub) uint32 — pack.pack_banded_stream_jax applied
    to each contiguous chunk (the kernel's field j scores chunk j).
    """
    from .. import pack

    S = codes.shape[0]
    if S % (n_sub * LANES):
        raise ValueError(
            f"subject count {S} must be a multiple of {n_sub * LANES}"
        )
    chunk = S // n_sub
    return jnp.stack([
        pack.pack_banded_stream_jax(codes[j * chunk:(j + 1) * chunk],
                                    threshold, query_len)
        for j in range(n_sub)
    ])
