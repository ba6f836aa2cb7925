"""Myers bit-vector edit distance as a Pallas TPU kernel.

TPU-native equivalent of the reference's generated SIMD kernels
(``/root/reference/original/BGSA_SSE/align_core.c:19-152``), re-designed for
the VPU instead of translated:

* the reference's "SIMD lane" axis (V_NUM subjects per register) becomes the
  (sublane, lane) = (R, 128) tile axis — LANE_BLOCK subjects per grid block;
* the reference's OpenMP (query x subject-chunk) tiling becomes the Pallas
  grid (subject_block, query), ordered so a subject block's Eq planes stay
  resident in VMEM across all queries (its cache-blocking trick, but managed
  by the pipeline, not by hand);
* one query character per `fori_loop` step: a scalar read from SMEM indexes
  the Eq character plane with a dynamic slice; the multi-word carry chain is
  unrolled at trace time (word_num is static).

Bit semantics are identical to the reference (31 usable bits per uint32 word,
reserved top carry bit, HP/HN cross-word shift chain, score bit at
``(read_len-1) % 31`` of the last word), so scores match bit-for-bit.

Note: the engine's TPU path uses the full-word kernel
(ops/myers_semiglobal.py with ``is_global=True``) instead — measured ~6-12%
faster; this module remains the reference-layout kernel (word_bits
parameterized) and the direct analogue of the generated C.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blockutil, myers_xla

WORD_BITS = 31
LANES = 128
# Sublane rows per grid block (64 -> 8192 subjects/block). The column
# recurrence is one serial dependency chain; wide-but-not-huge tiles win:
# kernel-only on v5e, R=16 -> 174 GCUPS, R=128 -> ~5.0 TCUPS, R=64 -> ~5.6,
# R=256 -> ~4.0 (VMEM pressure).
DEFAULT_ROWS = 64


def _column_words(eq_c, vp, vn, score, *, word_bits, maskh, carry_mask):
    """One query-character column over all words (the reference's 15-op
    reserved-carry update, align_core.c:74-138). Module-level so
    scripts/roofline.py can count its vector ops from the jaxpr.

    eq_c/vp/vn: (W, R, L) uint32; score: (R, L) int32.
    """
    W = eq_c.shape[0]
    tile = eq_c.shape[1:]
    hp_shift = jnp.ones(tile, jnp.uint32)
    hn_shift = jnp.zeros(tile, jnp.uint32)
    add_carry = jnp.zeros(tile, jnp.uint32)
    new_vp = []
    new_vn = []
    for j in range(W):
        pm = eq_c[j] | vn[j]
        s = (vp[j] & pm) + vp[j] + add_carry
        if j < W - 1:  # the last word's outgoing carries are unused
            add_carry = s >> word_bits
        # No mask on s: its bit 31 (the add carry) leaks into d0/hp, but
        # every consumer either masks (vp'/vn') or shifts it out (hp<<1),
        # and maskh is always below bit 31 — one op less on the hot chain
        # (+4% kernel-only, exact parity).
        d0 = (s ^ vp[j]) | pm
        hp = ~(d0 | vp[j]) | vn[j]
        hn = d0 & vp[j]
        if j == W - 1:
            hn_hit = (hn & maskh) != 0
            hp_hit = (hp & maskh) != 0
            score = score - hn_hit.astype(jnp.int32)
            score = score + jnp.logical_and(hp_hit, jnp.logical_not(hn_hit)).astype(jnp.int32)
        hp = (hp << 1) | hp_shift
        hn = (hn << 1) | hn_shift
        if j < W - 1:
            hp_shift = hp >> word_bits
            hn_shift = hn >> word_bits
        new_vp.append((~(d0 | hp) | hn) & carry_mask)
        new_vn.append((d0 & hp) & carry_mask)
    return jnp.stack(new_vp), jnp.stack(new_vn), score


def _kernel(q_ref, eq_ref, out_ref, *, read_len, word_bits, factor, q_len, unroll):
    """One (subject_block, query) grid cell.

    q_ref:  SMEM (1, 1, q_len) int32 — this query's symbol codes.
    eq_ref: VMEM (5, W, R, LANES) uint32 — this block's Eq planes.
    out_ref: VMEM (1, R, LANES) int32 — scores.
    """
    W, R = eq_ref.shape[1], eq_ref.shape[2]
    carry_mask = jnp.uint32((1 << word_bits) - 1)
    maskh = jnp.uint32(1 << ((read_len - 1) % word_bits))
    tile = (R, LANES)

    def column(i, state):
        vp, vn, score = state  # (W, R, L), (W, R, L), (R, L)
        c = q_ref[0, 0, i]
        eq_c = eq_ref[c]  # dynamic index on the character plane
        return _column_words(
            eq_c, vp, vn, score, word_bits=word_bits, maskh=maskh,
            carry_mask=carry_mask,
        )

    vp0 = jnp.full((W,) + tile, carry_mask)
    vn0 = jnp.zeros((W,) + tile, jnp.uint32)
    score0 = jnp.full(tile, read_len, jnp.int32)
    # Unroll several columns per loop step. The recurrence itself is serial;
    # the win is overlapping column i+1's Eq plane load + scalar work with
    # column i's compute (kernel-only interleaved medians on v5e: unroll=20 is
    # +41% over unroll=1, plateau by 20-25).
    state = (vp0, vn0, score0)

    def column_u(i, state):
        for u in range(unroll):
            state = column(i * unroll + u, state)
        return state

    state = lax.fori_loop(0, q_len // unroll, column_u, state)
    for i in range((q_len // unroll) * unroll, q_len):
        state = column(i, state)
    out_ref[0] = state[2] * jnp.int32(factor)


@functools.partial(
    jax.jit,
    static_argnames=(
        "read_len", "word_bits", "factor", "rows_per_block", "unroll", "interpret"
    ),
)
def myers_global(
    eq,
    queries,
    *,
    read_len: int,
    word_bits: int = WORD_BITS,
    factor: int = -1,
    rows_per_block: int = DEFAULT_ROWS,
    unroll: int | None = None,
    interpret: bool = False,
):
    """Global unit-cost Myers scores on TPU.

    Args:
      eq: (5, W, S) uint32 packed subjects; S must be a multiple of 128.
      queries: (Q, m) int32 query codes.
    Returns:
      (Q, S) int32 scores (= factor * edit_distance).
    """
    C, W, S = eq.shape
    Q, m = queries.shape
    if unroll is None:  # tuned default; 1 in interpret mode (tests crawl otherwise)
        # Interleaved-median A/B vs u20 (2026-08-18): +1.1% at 500bp, -0.2%
        # (noise) at 150bp — matches the full-word kernel's u30 default.
        unroll = 1 if interpret else 30
    if S % LANES:
        raise ValueError(f"subject count {S} must be a multiple of {LANES}")
    rows = S // LANES
    # VMEM budget: Eq blocks are double-buffered by the Pallas pipeline
    # (2*C planes) + VP/VN state (2) per word, against the ~16 MB scoped
    # stack — long subjects (large W) shrink the block.
    budget_rows = max((10 << 20) // ((2 * C + 2) * W * LANES * 4), 1)
    hard_rows = blockutil.HARD_VMEM_BYTES // ((2 * C + 2) * W * LANES * 4)
    if blockutil.vmem_floor_exceeded(rows, hard_rows):
        # Even an 8-row block exceeds scoped VMEM at this word count (~9.9
        # kbp at 31 bits/word) — run the scan twin (any word_num, same
        # scores).
        return myers_xla.myers_global(
            eq, queries, read_len=read_len, word_bits=word_bits, factor=factor
        )
    r, rows_p = blockutil.choose_rows(rows, rows_per_block, budget_rows)
    nb = rows_p // r
    eq4 = blockutil.pad_rows(eq.reshape(C, W, rows, LANES), 2, rows_p)

    grid = (nb, Q)  # query fastest -> Eq block stays resident across queries
    flops_per_cell = 20
    cost = pl.CostEstimate(
        flops=flops_per_cell * Q * m * W * S,
        bytes_accessed=eq.size * 4 + Q * S * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, read_len=read_len, word_bits=word_bits, factor=factor, q_len=m,
            unroll=max(1, min(unroll, m)),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, q: (q, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((C, W, r, LANES), lambda b, q: (0, 0, b, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, LANES), lambda b, q: (q, b, 0)),
        out_shape=jax.ShapeDtypeStruct((Q, rows_p, LANES), jnp.int32),
        cost_estimate=cost,
        interpret=interpret,
    )(queries.astype(jnp.int32)[:, None, :], eq4)
    return out[:, :rows].reshape(Q, S)
