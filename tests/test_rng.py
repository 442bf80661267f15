"""glibc random() recreation vs the reference's dumped initial matrices."""

import numpy as np
import pytest

from recsys_tpu.io.glibc_random import GlibcRandom, rand01_sequence
from recsys_tpu.models.mf import init_factors

from helpers import FIXTURES, parse_mats, assert_mats_close


@pytest.mark.parametrize("inst", ["inst0", "inst1", "inst2"])
def test_initial_factors_match_mats(inst):
    mats = parse_mats(FIXTURES / f"{inst}.mats")
    L_dump = mats["initial"]["L"]
    R_dump = mats["initial"]["R"]  # dumped in generated (k x items) orientation
    users, k = L_dump.shape
    k2, items = R_dump.shape
    assert k == k2
    state = init_factors(users, items, k)
    assert_mats_close(state.L, L_dump, f"{inst} initial L")
    assert_mats_close(state.R, R_dump.T, f"{inst} initial R")


def test_streaming_matches_bulk():
    g = GlibcRandom(0)
    chunks = np.concatenate([g.rand01(7), g.rand01(1), g.rand01(250), g.rand01(3)])
    bulk = rand01_sequence(261)
    np.testing.assert_array_equal(chunks, bulk)


def test_known_first_outputs():
    # First outputs of glibc srandom(0) — cross-checked against the C library.
    raw = GlibcRandom(0).raw(4)
    assert raw[0] == 1804289383  # the canonical first glibc rand() output
    assert (raw >= 0).all() and (raw < 2**31).all()


def test_seed_zero_coerced_to_one():
    np.testing.assert_array_equal(GlibcRandom(0).raw(10), GlibcRandom(1).raw(10))
