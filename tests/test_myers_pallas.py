import numpy as np
import pytest

from bgsa_tpu import pack
from bgsa_tpu.oracle import edit_distances
from bgsa_tpu.ops import myers_pallas


def run(queries, subjects, **kw):
    eq = pack.pack_eq(subjects, 31)
    return np.asarray(
        myers_pallas.myers_global(
            eq, queries.astype(np.int32), read_len=subjects.shape[1], interpret=True, **kw
        )
    )


@pytest.mark.parametrize("n", [20, 31, 64, 100])
def test_matches_oracle(rng, n):
    q = rng.integers(0, 4, size=(2, 40)).astype(np.int32)
    s = rng.integers(0, 4, size=(256, n))
    got = run(q, s)
    want = np.stack([-edit_distances(qi, s) for qi in q])
    np.testing.assert_array_equal(got, want)


def test_multiple_blocks(rng):
    q = rng.integers(0, 4, size=(1, 30)).astype(np.int32)
    s = rng.integers(0, 4, size=(512, 45))
    got = run(q, s, rows_per_block=2)  # 4 rows -> 2 blocks
    want = -edit_distances(q[0], s)[None]
    np.testing.assert_array_equal(got, want)
