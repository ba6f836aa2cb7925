import numpy as np

from bgsa_tpu import pack


def test_encode_ascii():
    got = pack.encode_ascii(np.frombuffer(b"ACGTNX\n", dtype=np.uint8))
    np.testing.assert_array_equal(got, [0, 1, 2, 3, 4, 0, 0])


def test_pack_roundtrip(rng):
    for word_bits in (31, 32):
        for L in (5, 31, 32, 33, 95, 100):
            codes = rng.integers(0, 5, size=(6, L))
            eq = pack.pack_eq(codes, word_bits)
            assert eq.shape == (5, pack.word_count(L, word_bits), 6)
            back = pack.unpack_eq(eq, L, word_bits)
            np.testing.assert_array_equal(back, codes)


def test_pack_matches_reference_layout():
    # One subject "ACGT" in a 31-bit word: bit b set in plane of char at b.
    eq = pack.pack_eq(np.array([[0, 1, 2, 3]]), 31)
    assert eq[0, 0, 0] == 0b0001
    assert eq[1, 0, 0] == 0b0010
    assert eq[2, 0, 0] == 0b0100
    assert eq[3, 0, 0] == 0b1000
    assert eq[4, 0, 0] == 0


def test_pack_jax_matches_numpy(rng):
    import jax

    codes = rng.integers(0, 5, size=(4, 70)).astype(np.int32)
    for word_bits in (31, 32):
        want = pack.pack_eq(codes, word_bits)
        got = np.asarray(jax.jit(pack.pack_eq_jax, static_argnames="word_bits")(codes, word_bits))
        np.testing.assert_array_equal(got, want)


def test_nibble_roundtrip(rng):
    from bgsa_tpu import pack

    for n in (7, 8, 150):
        codes = rng.integers(0, 5, size=(9, n)).astype(np.uint8)
        nib = pack.nibble_pack(codes)
        assert nib.shape == (9, (n + 1) // 2)
        back = np.asarray(pack.nibble_unpack_jax(nib, n))
        np.testing.assert_array_equal(back, codes)


def test_pack_banded_jax_matches_numpy(rng):
    from bgsa_tpu import pack

    for S, L, k, m in ((9, 70, 6, 64), (4, 40, 3, 50), (3, 33, 8, 33)):
        codes = rng.integers(0, 5, size=(S, L))
        lo, hi, inj = pack.pack_banded(codes, k, m)
        jlo, jhi, jinj = (np.asarray(x) for x in pack.pack_banded_jax(codes, k, m))
        np.testing.assert_array_equal(jlo, lo)
        np.testing.assert_array_equal(jhi, hi)
        np.testing.assert_array_equal(jinj, inj)


def test_two_bit_roundtrip(rng):
    from bgsa_tpu import pack

    for n in (7, 8, 150):
        codes = rng.integers(0, 4, size=(9, n)).astype(np.uint8)
        packed = pack.two_bit_pack(codes)
        assert packed.shape == (9, (n + 3) // 4)
        back = np.asarray(pack.two_bit_unpack_jax(packed, n))
        np.testing.assert_array_equal(back, codes)
