"""THP staging helpers (utils/hostmem.py): drop-in semantics.

These buffers replace np.zeros/np.empty on the GB-scale host staging
path (RNG output, factor permutes), where 4 KB first-touch faults cost
~5 us each on this host class; correctness here is exact equivalence."""

import numpy as np

from recsys_tpu.utils.hostmem import hugepage_empty, hugepage_zeros, take_cast


def test_hugepage_zeros_large_and_small():
    big = hugepage_zeros((1 << 20, 8), np.float64)  # 64 MB: mmap path
    assert big.shape == (1 << 20, 8) and big.dtype == np.float64
    assert not big.any()
    big[123, 4] = 7.0  # writable
    small = hugepage_zeros((10, 3), np.float32)  # np.empty path
    assert not small.any()


def test_pool_reuse_only_after_views_die():
    # Same-size request while a view is live must NOT alias it; after
    # the view dies the backing mmap is recycled (and re-zeroed).
    from recsys_tpu.utils import hostmem

    def backing(arr):  # walk the base chain to the mmap
        o = arr
        while getattr(o, "base", None) is not None:
            o = o.base
        return o

    a = hugepage_zeros((1 << 20, 8), np.float64)
    a[...] = 5.0
    a_buf = id(backing(a))
    b = hugepage_zeros((1 << 20, 8), np.float64)
    assert id(backing(b)) != a_buf
    assert not b.any()  # never handed dirty pages while distinct
    b[...] = 9.0
    del a
    c = hugepage_zeros((1 << 20, 8), np.float64)
    assert id(backing(c)) == a_buf  # recycled the freed buffer...
    assert not c.any()  # ...and re-zeroed it
    c[...] = 3.0
    cur = {id(backing(c)), id(backing(b))}
    del b, c
    d = hugepage_empty((1 << 21, 4), np.float64)  # same nbytes, empty
    assert id(backing(d)) in cur  # empty reuse skips the memset
    assert d.shape == (1 << 21, 4)


def test_take_cast_matches_fancy_index():
    rng = np.random.default_rng(3)
    src = rng.random((1000, 7))
    idx = rng.integers(0, 1000, size=4321).astype(np.int32)
    # cast path (f64 -> f32), chunked
    out = np.empty((4321, 7), np.float32)
    take_cast(src, idx, out, chunk=100)
    np.testing.assert_array_equal(out, src[idx].astype(np.float32))
    # same-dtype path
    out64 = np.empty((4321, 7), np.float64)
    take_cast(src, idx, out64, chunk=1000)
    np.testing.assert_array_equal(out64, src[idx])


def test_rand01_still_bit_exact():
    # The THP output buffer must not change a single draw.
    from recsys_tpu.io.glibc_random import GlibcRandom, rand01_sequence

    got = rand01_sequence(10_000, seed=0)
    np.testing.assert_array_equal(got, GlibcRandom(0).rand01(10_000))


def test_init_factors_unchanged():
    # In-place scaling + THP transpose staging must reproduce the exact
    # draw-order contract (SURVEY S0): L row-major, then R in (k x items).
    from recsys_tpu.io.glibc_random import GlibcRandom
    from recsys_tpu.models.mf import init_factors

    st = init_factors(13, 17, 5)
    draws = GlibcRandom(0).rand01(13 * 5 + 5 * 17) / 5
    np.testing.assert_array_equal(st.L, draws[: 13 * 5].reshape(13, 5))
    np.testing.assert_array_equal(st.R, draws[13 * 5 :].reshape(5, 17).T)
