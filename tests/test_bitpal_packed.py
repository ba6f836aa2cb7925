import numpy as np
import pytest

from bgsa_tpu import pack
from bgsa_tpu.oracle import align_scores, align_scores_query_in_subject
from bgsa_tpu.ops import bitpal_packed
from bgsa_tpu.schemes import Scoring

SCHEMES = [(2, -3, -5), (1, -1, -1), (3, -1, -2), (0, -2, -3)]


def oracle(queries, subjects, M, I, G):
    return np.stack([align_scores(q, subjects, Scoring(M, I, G)) for q in queries])


@pytest.mark.parametrize("M,I,G", SCHEMES)
def test_packed_xla_global(rng, M, I, G):
    q = rng.integers(0, 4, size=(2, 25)).astype(np.int32)
    s = rng.integers(0, 4, size=(8, 20))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(eq, q, match=M, mismatch=I, gap=G, read_len=20)
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G))


@pytest.mark.parametrize("n", [31, 40, 62, 70])
def test_packed_multi_word(rng, n):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 45)).astype(np.int32)
    s = rng.integers(0, 4, size=(6, n))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(eq, q, match=M, mismatch=I, gap=G, read_len=n)
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G), err_msg=f"n={n}")


def test_packed_semiglobal(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 20)).astype(np.int32)
    s = rng.integers(0, 4, size=(6, 45))
    s[0, 10:30] = q[0]
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(
            eq, q, match=M, mismatch=I, gap=G, read_len=45, semi_global=True
        )
    )
    want = np.stack([align_scores_query_in_subject(qi, s, Scoring(M, I, G)) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_packed_pallas(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 30)).astype(np.int32)
    s = rng.integers(0, 4, size=(256, 40))
    eq = pack.pack_eq(s, 31)
    got = np.asarray(
        bitpal_packed.bitpal_packed(
            eq, q, match=M, mismatch=I, gap=G, read_len=40, interpret=True
        )
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G))


def test_unsupported_scheme_raises(rng):
    q = np.zeros((1, 5), np.int32)
    eq = pack.pack_eq(np.zeros((1, 5), np.int64), 31)
    with pytest.raises(ValueError, match="packed"):
        bitpal_packed.bitpal_packed_xla(eq, q, match=5, mismatch=-1, gap=-2, read_len=5)


@pytest.mark.parametrize("M,I,G,n", [
    (2, -3, -5, 20), (2, -3, -5, 32), (2, -3, -5, 33), (2, -3, -5, 70),
    (1, -1, -1, 33), (3, -1, -2, 70), (0, -2, -3, 33),
])
def test_packed_carry_variant_xla(rng, M, I, G, n):
    """The full-32-bit compare-carry variant (KNC hw-adc analogue,
    original/BGSA_KNC/align_core.c:1153): identical scores to the oracle at
    word-boundary-straddling lengths (32 fills exactly one full word; 33
    forces the cross-word carry chain); every supported scheme crosses a
    word boundary at least once."""
    q = rng.integers(0, 4, size=(2, 45)).astype(np.int32)
    s = rng.integers(0, 4, size=(8, n))
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(
            eq, q, match=M, mismatch=I, gap=G, read_len=n, word_bits=32
        )
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G), err_msg=f"n={n}")


def test_packed_carry_semiglobal_and_factor(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 20)).astype(np.int32)
    s = rng.integers(0, 4, size=(6, 45))
    s[0, 10:30] = q[0]
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        bitpal_packed.bitpal_packed_xla(
            eq, q, match=M, mismatch=I, gap=G, read_len=45, word_bits=32,
            semi_global=True,
        )
    )
    want = np.stack(
        [align_scores_query_in_subject(qi, s, Scoring(M, I, G)) for qi in q]
    )
    np.testing.assert_array_equal(got, want)


def test_packed_carry_pallas_interpret(rng):
    M, I, G = 2, -3, -5
    q = rng.integers(0, 4, size=(2, 18)).astype(np.int32)
    s = rng.integers(0, 4, size=(128, 40))
    eq = pack.pack_eq(s, 32)
    got = np.asarray(
        bitpal_packed.bitpal_packed(
            eq, q, match=M, mismatch=I, gap=G, read_len=40, word_bits=32,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, oracle(q, s, M, I, G))


def test_engine_carry_flag_matches_default(rng, tmp_path):
    """config.bitpal_carry routes the engine through the 32-bit kernel
    (word pack shrinks) with byte-identical pipeline output."""
    from bgsa_tpu import pipeline as pl_mod
    from bgsa_tpu.io import seqfile
    from bgsa_tpu.schemes import Mode, normalize

    q = rng.integers(0, 4, size=(2, 40))
    s = rng.integers(0, 4, size=(300, 40))
    qp, sp = str(tmp_path / "q.txt"), str(tmp_path / "s.txt")
    seqfile.write_seq_file(qp, q)
    seqfile.write_seq_file(sp, s)
    scheme = normalize(Scoring(2, -3, -5), Mode.GLOBAL)
    eng31 = pl_mod.Engine(scheme, pl_mod.PipelineConfig(backend="xla"))
    eng32 = pl_mod.Engine(
        scheme, pl_mod.PipelineConfig(backend="xla", bitpal_carry=True)
    )
    assert (eng31.word_bits, eng32.word_bits) == (31, 32)
    a, b = str(tmp_path / "a.bin"), str(tmp_path / "b.bin")
    pl_mod.run_alignment(qp, sp, a, scoring=Scoring(2, -3, -5),
                         config=pl_mod.PipelineConfig(backend="xla"))
    pl_mod.run_alignment(qp, sp, b, scoring=Scoring(2, -3, -5),
                         config=pl_mod.PipelineConfig(backend="xla",
                                                      bitpal_carry=True))
    assert open(a, "rb").read() == open(b, "rb").read()
