import numpy as np
import pytest

from bgsa_tpu import native, pack


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


import contextlib


@contextlib.contextmanager
def pure_python():
    """Force the pure-NumPy fallbacks (the no-g++ production path)."""
    import os

    os.environ["BGSA_NO_NATIVE"] = "1"
    native._tried, native._lib = True, None
    try:
        yield
    finally:
        del os.environ["BGSA_NO_NATIVE"]
        native._tried = False


def python_pack_banded(codes, k, qlen):
    with pure_python():
        return pack.pack_banded(codes, k, qlen)


def test_pack_banded_matches_python(lib, rng):
    codes = rng.integers(0, 5, size=(37, 150)).astype(np.uint8)
    got = native.pack_banded(codes, 8, 150)
    want = python_pack_banded(codes, 8, 150)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_pack_eq_matches_python(lib, rng):
    codes = rng.integers(0, 5, size=(13, 70)).astype(np.uint8)
    for wb in (31, 32):
        got = native.pack_eq(codes, wb)
        # the pure path must be forced: pack.pack_eq with in-range codes
        # routes straight back to the native packer (a native-vs-native
        # compare would be vacuous)
        with pure_python():
            want = pack.pack_eq(codes, wb)
        np.testing.assert_array_equal(got, want)


def test_transport_pack_matches_python(lib, rng):
    """The pure-NumPy nibble/2-bit/count_n fallbacks (used when g++ is
    absent) must produce byte-identical payloads to the native packers —
    a divergence would silently corrupt every subject upload there."""
    codes = rng.integers(0, 5, size=(300, 73)).astype(np.uint8)
    clean = rng.integers(0, 4, size=(256, 41)).astype(np.uint8)
    nib_native = pack.nibble_pack(codes)
    two_native = pack.two_bit_pack(clean)
    n_native = native.count_n(codes)
    with pure_python():
        np.testing.assert_array_equal(pack.nibble_pack(codes), nib_native)
        np.testing.assert_array_equal(pack.two_bit_pack(clean), two_native)
        assert int(np.count_nonzero(codes > 3)) == n_native


def test_native_convert_matches_python(lib, tmp_path, rng):
    from bgsa_tpu.io import result as result_io

    res = str(tmp_path / "r.bin")
    w = result_io.ResultWriter(res, ref_count=3, block_num=2, device_num=2)
    blocks = [
        (rng.integers(-300, 300, size=(3, 6)), rng.integers(-300, 300, size=(3, 4)), 1),
        (rng.integers(-300, 300, size=(3, 2)), rng.integers(-300, 300, size=(3, 8)), 0),
    ]
    for a, b, extra in blocks:
        w.start_bucket([a.shape[1], b.shape[1]], extra)
        for qs in range(0, 3, 2):
            w.write_scores(a[qs : qs + 2])
            w.write_scores(b[qs : qs + 2])
    w.close()

    out_native = str(tmp_path / "n.txt")
    out_python = str(tmp_path / "p.txt")
    assert native.convert_result(res, out_native, 2, 2)
    import os

    os.environ["BGSA_NO_NATIVE"] = "1"
    try:
        native._tried, native._lib = True, None
        result_io.convert_result(res, out_python, ref_bucket_count=2)
    finally:
        del os.environ["BGSA_NO_NATIVE"]
        native._tried = False
    assert open(out_native).read() == open(out_python).read()


def test_transport_pack_threads_equal(rng):
    """Threaded native packers (-N fan-out) produce identical bytes."""
    from bgsa_tpu import native, pack

    codes = rng.integers(0, 5, size=(5000, 73)).astype(np.uint8)
    clean = rng.integers(0, 4, size=(4096, 40)).astype(np.uint8)
    for threads in (2, 8):
        np.testing.assert_array_equal(
            pack.nibble_pack(codes, threads=threads), pack.nibble_pack(codes)
        )
        np.testing.assert_array_equal(
            pack.two_bit_pack(clean, threads=threads), pack.two_bit_pack(clean)
        )
        if native.get_lib() is not None:
            got = native.pack_banded(codes, 6, 80, threads=threads)
            want = native.pack_banded(codes, 6, 80)
            for a, b in zip(got, want):
                np.testing.assert_array_equal(a, b)
    # select_transport with threads picks the same transport + payload
    name1, p1 = pack.select_transport(clean)
    name2, p2 = pack.select_transport(clean, threads=4)
    assert name1 == name2 == "2bit"
    np.testing.assert_array_equal(p1, p2)
