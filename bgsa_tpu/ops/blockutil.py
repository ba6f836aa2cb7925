"""Grid-block sizing shared by the Pallas kernel wrappers.

Mosaic requires the sublane (second-to-last) block dimension to be a multiple
of 8 or equal to the array dimension. Subject counts are only guaranteed to
be multiples of 128 (one lane row), so instead of searching for divisors of
the row count (which can be as bad as 2 — e.g. 5942 rows for a 760k-subject
bucket), blocks are 8-sublane-aligned and the row axis is zero-padded up to a
block multiple; pad scores are computed and discarded.
"""

from __future__ import annotations

import jax.numpy as jnp


def choose_rows(rows: int, *limits: int) -> tuple[int, int]:
    """(rows_per_block, padded_rows) with the Mosaic sublane constraint.

    Blocks are floored at 8 sublane rows (or the whole array when it is
    smaller) — a VMEM budget below that cannot be honored by shrinking the
    row axis, so callers' budget formulas must treat 8 rows as the minimum
    block (their per-word VMEM cost times 8 is the floor; see the
    ``budget_rows = max(..., 1)`` expressions in the kernel wrappers).
    """
    r = min(rows, *limits)
    if r <= 0:
        r = 1
    if r >= rows:
        return rows, rows
    r = max(r - r % 8, 8)
    if r >= rows:
        # The 8-row floor reached the whole array: a full-dimension block
        # also satisfies Mosaic and avoids padding past the array.
        return rows, rows
    padded = -(-rows // r) * r
    return r, padded


# Scoped-VMEM hard ceiling for the routing decision. The kernels budget
# blocks against a soft ~10 MB (headroom for the pipeline's double
# buffering), but a block floored at 8 sublane rows may exceed that budget
# and still compile — the real Mosaic failure is at ~16 MB (measured: r32 at
# W=94 = 16.78 MB "failed to compile", myers_semiglobal.py). Routing on the
# soft budget would needlessly demote W ~214-340 geometries that Pallas
# handles; 15 MB keeps a safety margin under the measured ceiling.
HARD_VMEM_BYTES = 15 << 20


def vmem_floor_exceeded(rows: int, hard_rows: int) -> bool:
    """True when even the smallest legal block exceeds scoped VMEM.

    Blocks cannot go below 8 sublane rows (or the whole array when smaller),
    so ``hard_rows`` (= HARD_VMEM_BYTES / bytes-per-row) under that floor
    means the Pallas kernel would die inside Mosaic with no friendly error —
    the reference kernels take any ``word_num``
    (original/BGSA_SSE/cal_sse.c:253-257), so wrappers route this geometry
    to their XLA twin instead (same scores, any length).
    """
    return hard_rows < min(rows, 8)


def pad_rows(arr, axis: int, padded: int):
    """Zero-pad ``arr`` along ``axis`` up to ``padded`` rows."""
    rows = arr.shape[axis]
    if rows == padded:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, padded - rows)
    return jnp.pad(arr, widths)
