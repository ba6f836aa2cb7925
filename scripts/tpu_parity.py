"""On-chip parity check: every Pallas kernel family vs the NumPy oracles.

The CI suite runs the kernels under the Pallas interpreter on CPU; this
script executes the real Mosaic compilations on the attached TPU and
byte-compares scores against the oracles / behavioral reference — catches
TPU-specific miscompiles the CPU suite cannot.

Usage: python scripts/tpu_parity.py [seed]   (first run compiles ~10 kernels)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from bgsa_tpu.benchutil import backend_alive

    if not backend_alive():
        raise SystemExit(
            "TPU service unresponsive (backend init probe timed out); "
            "retry in a later service window"
        )

    import jax

    from bgsa_tpu import pack
    from bgsa_tpu.banded_ref import banded_scores
    from bgsa_tpu.oracle import align_scores, align_scores_query_in_subject
    from bgsa_tpu.ops import banded, bitpal, bitpal_packed, myers_pallas, myers_semiglobal
    from bgsa_tpu.schemes import Mode, Scoring

    assert jax.default_backend() != "cpu", "attach a TPU (this is the on-chip check)"
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 42
    rng = np.random.default_rng(seed)
    failures = []

    def check(name, got, want):
        got, want = np.asarray(got), np.asarray(want)
        ok = np.array_equal(got, want)
        print(f"{'ok ' if ok else 'FAIL'} {name}")
        if not ok:
            bad = np.argwhere(got != want)[:3]
            failures.append((name, bad, got[tuple(bad[0])], want[tuple(bad[0])]))

    Q, m, S, n = 4, 137, 512, 211  # deliberately unaligned lengths
    q = rng.integers(0, 4, size=(Q, m)).astype(np.int32)
    s = rng.integers(0, 5, size=(S, n))  # incl. N
    eq31 = jax.device_put(pack.pack_eq(s, 31))
    eq32 = jax.device_put(pack.pack_eq(s, 32))
    qd = jax.device_put(q)

    unit = Scoring(0, -1, -1)
    want_g = np.stack([align_scores(qi, s, unit) for qi in q])
    want_sg = np.stack([align_scores(qi, s, unit, Mode.SEMI_GLOBAL) for qi in q])

    check("myers_pallas 31-bit global",
          myers_pallas.myers_global(eq31, qd, read_len=n), want_g)
    check("myers full-word global",
          myers_semiglobal.myers_semiglobal(eq32, qd, read_len=n, is_global=True,
                                            factor=-1), want_g)
    check("myers full-word semi-global",
          myers_semiglobal.myers_semiglobal(eq32, qd, read_len=n, factor=-1), want_sg)

    bp = Scoring(2, -3, -5)
    want_bp = np.stack([align_scores(qi, s, bp) for qi in q])
    want_bps = np.stack([align_scores_query_in_subject(qi, s, bp) for qi in q])
    kw = dict(match=2, mismatch=-3, gap=-5, read_len=n)
    check("bitpal packed global", bitpal_packed.bitpal_packed(eq31, qd, **kw), want_bp)
    check("bitpal packed semi",
          bitpal_packed.bitpal_packed(eq31, qd, semi_global=True, **kw), want_bps)
    check("bitpal packed 32-bit carry",
          bitpal_packed.bitpal_packed(eq32, qd, word_bits=32, **kw), want_bp)
    check("bitpal packed 32-bit carry semi",
          bitpal_packed.bitpal_packed(eq32, qd, word_bits=32, semi_global=True,
                                      **kw), want_bps)
    check("bitpal non-packed global", bitpal.bitpal(eq31, qd, **kw), want_bp)
    check("bitpal non-packed semi",
          bitpal.bitpal(eq31, qd, semi_global=True, **kw), want_bps)
    check("bitpal non-packed 32-bit carry",
          bitpal.bitpal(eq32, qd, word_bits=32, **kw), want_bp)
    check("bitpal non-packed 32-bit carry semi",
          bitpal.bitpal(eq32, qd, word_bits=32, semi_global=True, **kw),
          want_bps)
    # other trace-time-generated networks: 3-plane packed and a scheme the
    # packed decode can't cover (non-packed fallback)
    s12 = Scoring(1, -2, -3)
    check("bitpal packed (1,-2,-3)",
          bitpal_packed.bitpal_packed(eq31, qd, match=1, mismatch=-2, gap=-3,
                                      read_len=n),
          np.stack([align_scores(qi, s, s12) for qi in q]))
    s51 = Scoring(5, -1, -2)
    check("bitpal non-packed (5,-1,-2)",
          bitpal.bitpal(eq31, qd, match=5, mismatch=-1, gap=-2, read_len=n),
          np.stack([align_scores(qi, s, s51) for qi in q]))

    # banded: s >= q (single stream), s < q (dual stream), Peq-carry
    mq, k = 120, 9
    qb = rng.integers(0, 4, size=(2, mq)).astype(np.int32)
    for nb, label in ((mq + 10, "s>q"), (mq, "s==q"), (mq - 5, "s<q")):
        sb = rng.integers(0, 4, size=(256, nb))
        sb[:80, : min(mq, nb)] = qb[0][: min(mq, nb)]
        want = np.stack([banded_scores(qi, sb, k) for qi in qb])
        qbd = jax.device_put(qb)
        if nb >= mq:
            stream = jax.jit(pack.pack_banded_stream_jax, static_argnums=(1, 2))(sb, k, mq)
            stream_d = jax.device_put(np.asarray(stream))
            got = banded.banded_stream(stream_d, qbd, q_len=mq, s_len=nb, k=k)
            check(f"banded stream {label} (no block exit)",
                  banded.banded_stream(stream_d, qbd, q_len=mq, s_len=nb, k=k,
                                       block_exit=False), want)
        else:
            streams = jax.jit(pack.pack_banded_streams_jax, static_argnums=(1, 2))(sb, k, mq)
            got = banded.banded_stream_dual(jax.device_put(np.asarray(streams)), qbd,
                                            q_len=mq, s_len=nb, k=k)
        check(f"banded stream {label}", got, want)
        lo, hi, inj = map(jax.device_put, pack.pack_banded(sb, k, mq))
        check(f"banded peq-carry {label}",
              banded.banded(lo, hi, inj, qbd, q_len=mq, s_len=nb, k=k), want)

    # packed-field banded (subject-interleaved bands): the CPU suite can
    # only interpret n_sub <= 4 (XLA CPU simplifier livelock on wider
    # networks), so the n_sub = 5/6 Mosaic compiles are validated HERE.
    from bgsa_tpu.ops import banded_packed

    for (mp, np_, kp) in ((150, 150, 8), (100, 100, 4), (72, 72, 5)):
        n_sub = banded_packed.packed_subbands(mp, np_, kp)
        qp = rng.integers(0, 4, size=(2, mp)).astype(np.int32)
        sp = rng.integers(0, 4, size=(n_sub * 128, np_))
        sp[:40, :mp] = qp[0][: min(mp, np_)]
        streams = jax.device_put(np.asarray(banded_packed.pack_packed_streams_jax(
            np.asarray(sp, np.int32), kp, mp, n_sub)))
        check(f"banded packed n_sub={n_sub} (k={kp})",
              banded_packed.banded_stream_packed(
                  streams, jax.device_put(qp), q_len=mp, s_len=np_, k=kp),
              np.stack([banded_scores(qi, sp, kp) for qi in qp]))

    if failures:
        print("\nFAILURES:", failures)
        return 1
    print("\nall TPU kernels bit-exact vs oracles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
