"""Model study: subject-interleaved band packing for the banded kernel.

The round-4 roofline left one algorithmic lever on the banded family
(docs/PERF.md "Roofline"): pack several subjects' bands into one 64-bit
register pair at pitch band_length+1 (~2.5x fewer ops/cell). The blocker is
semantics: the reference's banded scores depend on the full 64-bit above-band
carry dynamics (banded/BGSA_CPU/align_core.c runs the recurrence over the
whole word; truncating the register to 32 bits diverges 16% of scores), so a
pitch-(band+1) field CANNOT be byte-exact.

This script measures the viable contract instead: a packed field with a
chosen top-of-band boundary rule used as a PRE-FILTER, with packed-passing
lanes re-scored by the exact kernel. That architecture is byte-exact iff the
packed field never FALSELY REJECTS — i.e. packed_score > max_err implies
ref_score > max_err (equivalently: packed early-exit latches only when the
reference's would, and the packed final score exceeds max_err only when the
reference's does). False PASSES are harmless (the exact rescreen fixes
them); their rate is the efficiency tax.

Boundary rules modeled (what the shifted-in D0 top bit claims about the
out-of-band diagonal neighbor):
  trunc0:  Xs = (D0 & band) >> 1              (inject 0: outside diag is worse)
  opt1:    Xs = ((D0 & band) >> 1) | top_bit  (inject 1: outside diag equal —
                                               optimistic, candidate for the
                                               one-sided <= invariant)
Both keep VP/VN masked to the band so the field's guard bit stays 0 and add
carries cannot cross sub-bands (the packed kernel's isolation requirement).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/exp_banded_packed_model.py
(pure NumPy; no JAX needed, flag only to keep the axon tunnel out of it)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bgsa_tpu.banded_ref import MAX_ERROR, checkpoint_columns

U64 = np.uint64
M64 = U64(0xFFFFFFFFFFFFFFFF)


def batch_scores(queries, subjects, k, rules=("ref", "trunc0", "opt1")):
    """Vectorized banded scores for every (query, subject) pair under each
    register rule. queries (Q, m) int8 codes, subjects (N, n) int8.
    Returns {rule: (Q, N) int32 scores} plus per-column bottom-row err
    domination violation counts for the packed rules."""
    Q, m = queries.shape
    N, n = subjects.shape
    h = k + n - m
    assert h >= k, "model covers the stream geometry (s_len >= q_len)"
    band_down = k + h
    max_err = k + h + 1
    band = U64((1 << (band_down + 1)) - 1)
    top = U64(1 << band_down)
    checks = checkpoint_columns(m, n, k)

    # Initial Peq window: subject[i] at bit k+1+i, i < k (banded_ref).
    peq0 = np.zeros((5, N), U64)
    for i in range(min(k, n)):
        np.bitwise_or.reduce  # noqa: B018 (readability anchor)
        for c in range(5):
            peq0[c] |= U64(1 << (k + 1 + i)) * (subjects[:, i] == c)

    out = {}
    viol = {r: 0 for r in rules if r != "ref"}
    viol["carry_out_cols"] = 0  # columns where the in-band add carries past
    # band_down — the ONLY case where ref64 injects a different Xs top bit
    # than trunc0; the sweep must exercise it for the equality to mean much
    for rule in rules:
        out[rule] = np.zeros((Q, N), np.int32)

    for qi in range(Q):
        query = queries[qi]
        peq = peq0.copy()
        state = {}
        for rule in rules:
            state[rule] = dict(
                VP=np.zeros(N, U64), VN=np.zeros(N, U64),
                err=np.full(N, k, np.int64), dead=np.zeros(N, bool),
            )
        for t in range(m):
            c = int(query[t])
            eq_full = peq[c]
            for rule in rules:
                st = state[rule]
                VP, VN = st["VP"], st["VN"]
                if rule == "ref":
                    eq = eq_full
                    X = eq | VN
                    D0 = ((((X & VP) + VP) & M64) ^ VP) | X
                    Xs = D0 >> U64(1)
                    c_out = (((X & VP & band) + (VP & band)) >> U64(band_down + 1)) & U64(1)
                    viol["carry_out_cols"] += int(np.count_nonzero(c_out))
                else:
                    eq = eq_full & band
                    X = eq | VN
                    # field add: carry out of band absorbed by the guard bit
                    D0 = ((((X & VP) + VP) & M64) ^ VP) | X
                    Xs = (D0 & band) >> U64(1)
                    if rule == "opt1":
                        Xs = Xs | top
                HN = D0 & VP
                HP = (~(D0 | VP) & M64) | VN
                VN = Xs & HP
                VP = (~(HP | Xs) & M64) | HN
                if rule != "ref":
                    VN &= band
                    VP &= band
                st["VP"], st["VN"] = VP, VN
                if t >= k:
                    st["err"] += 1 - (D0 & U64(1)).astype(np.int64)
                if (t + 1) in checks:
                    st["dead"] |= st["err"] > max_err
            # packed err must never exceed ref err (false-reject invariant)
            for rule in rules:
                if rule != "ref":
                    viol[rule] += int(
                        np.count_nonzero(state[rule]["err"] > state["ref"]["err"])
                    )
            peq >>= U64(1)
            if t < m - k:
                idx = k + t
                if idx < n:
                    for c2 in range(5):
                        peq[c2] |= top * (subjects[:, idx] == c2)
        for rule in rules:
            st = state[rule]
            cur = st["err"].copy()
            mn = st["err"].copy()
            for i in range(h + 1):
                cur += ((st["VP"] >> U64(i)) & U64(1)).astype(np.int64)
                cur -= ((st["VN"] >> U64(i)) & U64(1)).astype(np.int64)
                np.minimum(mn, cur, out=mn)
            out[rule][qi] = np.where(st["dead"], MAX_ERROR, mn).astype(np.int32)
    return out, viol


def mutate(rng, seq, dist):
    """Apply `dist` random single-char edits (sub/ins/del) to a copy."""
    s = list(seq)
    for _ in range(dist):
        op = rng.integers(3)
        pos = int(rng.integers(len(s))) if s else 0
        if op == 0 and s:
            s[pos] = int(rng.integers(4))
        elif op == 1:
            s.insert(pos, int(rng.integers(4)))
        elif s:
            del s[pos]
    return s


def dataset(rng, Q, N, m, n, k):
    """Mix: random garbage + mutated copies at distances 0..k+4 (threshold
    straddling) + band-edge adversaries (prefix/suffix indel bursts that
    push the optimal path onto the band boundary)."""
    queries = rng.integers(0, 4, (Q, m)).astype(np.int8)
    subs = np.zeros((N, n), np.int8)
    subs[: N // 3] = rng.integers(0, 4, (N // 3, n))
    qi = 0
    for j in range(N // 3, N):
        base = queries[qi % Q]
        qi += 1
        if j % 4 == 3:  # band-edge adversary: k-indel burst at one end
            burst = int(rng.integers(1, k + 1))
            if j % 8 < 4:
                s = list(base[burst:]) + [int(rng.integers(4))] * burst
            else:
                s = [int(rng.integers(4))] * burst + list(base[: m - burst])
            s = mutate(rng, s, int(rng.integers(0, 3)))
        else:
            s = mutate(rng, base, int(rng.integers(0, k + 5)))
        s = (s + list(rng.integers(0, 4, n)))[:n]
        subs[j] = s
    return queries, subs


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    pairs_target = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    rng = np.random.default_rng(seed)
    geoms = [
        (150, 150, 8), (150, 150, 4), (150, 150, 12), (100, 100, 8),
        (150, 158, 8), (96, 128, 6), (500, 500, 8), (150, 150, 16),
    ]
    grand = {"trunc0": 0, "opt1": 0}
    for (m, n, k) in geoms:
        Q, N = 8, max(256, pairs_target // (8 * len(geoms)))
        queries, subs = dataset(rng, Q, N, m, n, k)
        out, viol = batch_scores(queries, subs, k)
        ref = out["ref"]
        max_err = 2 * k + n - m + 1
        print(f"geom m={m} n={n} k={k}  pairs={Q * N}  "
              f"carry_out_cols={viol['carry_out_cols']}")
        for rule in ("trunc0", "opt1"):
            sc = out[rule]
            false_rej = np.count_nonzero((sc > max_err) & (ref <= max_err))
            false_pass = np.count_nonzero((sc <= max_err) & (ref > max_err))
            pass_total = np.count_nonzero(ref <= max_err)
            exact_on_pass = np.count_nonzero((ref <= max_err) & (sc == ref))
            above = np.count_nonzero(sc > ref)
            print(
                f"  {rule:6s}: err-domination-violations(cols)={viol[rule]:6d} "
                f"score>ref={above:6d} false_rej={false_rej:4d} "
                f"false_pass={false_pass:5d} ref_pass={pass_total:6d} "
                f"exact_on_pass={exact_on_pass}/{pass_total}"
            )
            grand[rule] += false_rej + (viol[rule] if rule == "opt1" else 0)
    print(f"\nopt1 one-sided invariant violations total: {grand['opt1']}")
    print(f"trunc0 false rejects total: {grand['trunc0']}")


if __name__ == "__main__":
    main()
