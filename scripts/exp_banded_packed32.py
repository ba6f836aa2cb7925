"""Model study 2: the 32-bit packed-field banded kernel, bit-for-bit.

exp_banded_packed_model.py proved the trunc0 rule (band-masked registers,
inject 0 at the band top) reproduces the reference's 64-bit banded scores
exactly. This script models the actual TPU kernel that exploits it: the
whole recurrence in ONE uint32 word holding F = 32 // (band_down + 2)
subjects as pitch-(band_down+2) fields, each with a guard bit that absorbs
the in-band add's carry-out so fields cannot interact:

    field f occupies bits [f*pitch, f*pitch + band_down]; guard at
    f*pitch + band_down + 1 (the top field's guard may be an implicit
    word-overflow bit when pitch divides 32 exactly — uint32 wraparound
    discards it, which is equivalent to a guard).

Per column: eq is rebuilt per field from the flat stream window
(pack_banded_stream_jax convention: window(t) = stream bits [t, t+bd]),
placed at the field offsets; one add serves all F fields; Xs / VP are
masked so guard bits stay clear for the next column. err/dead/epilogue are
per-field (per-subject state cannot pack).

Eligibility: h >= k (flat stream soundness, as banded_stream) and
band_down <= 30 (field + guard fit a word).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/exp_banded_packed32.py
(pure NumPy; flag only keeps the axon tunnel out of it)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bgsa_tpu.banded_ref import MAX_ERROR, banded_score, checkpoint_columns
from scripts.exp_banded_packed_model import dataset

U32 = np.uint32


def pack_stream_bits(subjects, k, m):
    """Flat per-char bit-streams (pack.pack_banded_stream_jax convention),
    as (5, N, total_bits) uint8 for model convenience."""
    N, n = subjects.shape
    h = k + n - m
    band_down = k + h
    nA = min(k, n)
    nB = min(max(m - k, 0), max(n - k, 0))
    total = max(k + 1 + nA, band_down + 1 + nB) + band_down + 2
    bits = np.zeros((5, N, total), np.uint8)
    for i in range(nA):  # preload: subject[i] at stream position k+1+i
        for c in range(5):
            bits[c, :, k + 1 + i] |= subjects[:, i] == c
    for t in range(nB):  # injections: subject[k+t] at band_down+1+t
        for c in range(5):
            bits[c, :, band_down + 1 + t] |= subjects[:, k + t] == c
    return bits


def packed32_scores(queries, subjects, k):
    """(Q, N) scores from the modeled packed kernel. Requires h >= k and
    band_down <= 30. Subjects are grouped contiguously: field f of packed
    element g holds subject f*G + g (G = ceil(N / F))."""
    Q, m = queries.shape
    N, n = subjects.shape
    h = k + n - m
    assert h >= k, "packed kernel covers the stream geometry (s_len >= q_len)"
    band_down = k + h
    assert band_down <= 30, "field + guard must fit one 32-bit word"
    pitch = band_down + 2
    F = 32 // pitch
    max_err = k + h + 1
    checks = checkpoint_columns(m, n, k)

    G = -(-N // F)  # packed elements; zero-pad the subject dim to F*G
    pad = F * G - N
    subs = np.vstack([subjects, np.full((pad, n), 4, np.int8)]) if pad else subjects
    streams = pack_stream_bits(subs, k, m)  # (5, F*G, total)

    offs = [f * pitch for f in range(F)]
    BAND = U32(sum(((1 << (band_down + 1)) - 1) << o for o in offs))
    XS_MASK = U32(sum(((1 << band_down) - 1) << o for o in offs))
    total_bits = streams.shape[2]

    # window(t) per field = stream bits [t, t+bd]; build packed eq per column
    def packed_eq(c, t):
        w = np.zeros(G, U32)
        for f, o in enumerate(offs):
            grp = streams[c, f * G:(f + 1) * G]  # (G, total)
            width = min(band_down + 1, total_bits - t)
            win = grp[:, t:t + width]
            val = np.zeros(G, U32)
            for j in range(width):
                val |= win[:, j].astype(U32) << U32(j)
            w |= val << U32(o)
        return w

    out = np.zeros((Q, F * G), np.int32)
    for qi in range(Q):
        query = queries[qi]
        VP = np.zeros(G, U32)
        VN = np.zeros(G, U32)
        err = np.full((F, G), k, np.int64)
        dead = np.zeros((F, G), bool)
        for t in range(m):
            c = int(query[t])
            eq = packed_eq(c, t)
            X = eq | VN
            D0 = (((X & VP) + VP) ^ VP) | X  # uint32 wraparound = top guard
            HN = D0 & VP
            HP = ~(D0 | VP) | VN
            Xs = (D0 >> U32(1)) & XS_MASK
            VN = Xs & HP
            VP = (~(HP | Xs) | HN) & BAND
            if t >= k:
                for f, o in enumerate(offs):
                    err[f] += 1 - ((D0 >> U32(o)) & U32(1)).astype(np.int64)
            if (t + 1) in checks:
                dead |= err > max_err
        for f, o in enumerate(offs):
            cur = err[f].copy()
            mn = err[f].copy()
            for i in range(h + 1):
                cur += ((VP >> U32(o + i)) & U32(1)).astype(np.int64)
                cur -= ((VN >> U32(o + i)) & U32(1)).astype(np.int64)
                np.minimum(mn, cur, out=mn)
            out[qi, f * G:(f + 1) * G] = np.where(dead[f], MAX_ERROR, mn)
    return out[:, :N]


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    rng = np.random.default_rng(seed)
    geoms = [  # (m, n, k) -> F: 1 (k=8 headline), 3 (k=4), 6 (k=2),
        # boundary band_down=30 (k=15), h>k offsets, 500bp long
        (150, 150, 8), (150, 150, 4), (150, 150, 2), (150, 150, 15),
        (150, 158, 8), (120, 126, 3), (500, 500, 8), (100, 100, 12),
    ]
    total_pairs = 0
    for (m, n, k) in geoms:
        bd = 2 * k + n - m
        F = 32 // (bd + 2)
        Q, N = 4, 600
        queries, subs = dataset(rng, Q, N, m, n, k)
        got = packed32_scores(queries, subs, k)
        mism = 0
        for qi in range(Q):
            for si in range(N):
                ref = banded_score(queries[qi], subs[si], k)
                if ref != got[qi, si]:
                    mism += 1
                    if mism <= 3:
                        print(f"  MISMATCH q{qi} s{si}: ref={ref} got={got[qi, si]}")
        total_pairs += Q * N
        print(f"geom m={m} n={n} k={k} band_down={bd} F={F}: "
              f"{Q * N} pairs, {mism} mismatches")
        assert mism == 0, f"packed32 diverges at m={m} n={n} k={k}"
    print(f"\nALL EXACT: {total_pairs} pairs, 0 mismatches")


if __name__ == "__main__":
    main()
