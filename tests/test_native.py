"""Native C ingest layer vs the numpy reference implementations."""

import numpy as np
import pytest

from recsys_tpu.io import _native
from recsys_tpu.io.glibc_random import GlibcRandom
from recsys_tpu.io.parser import load_problem, parse_in_bytes

from helpers import FIXTURES


def fixture_path(name: str) -> str:
    return str(FIXTURES / name)

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="no C toolchain to build the native library"
)


def test_native_rand01_matches_numpy():
    ref = GlibcRandom(0).rand01(10_000)
    nat = _native.rand01(10_000, 0)
    np.testing.assert_array_equal(nat, ref)


def test_native_rand01_nonzero_seed():
    ref = GlibcRandom(12345).rand01(1_000)
    nat = _native.rand01(1_000, 12345)
    np.testing.assert_array_equal(nat, ref)


@pytest.mark.parametrize("name", ["inst0.in", "inst30-40-10-2-10.in", "instML100k.in"])
def test_native_parse_matches_numpy(name):
    path = fixture_path(name)
    with open(path, "rb") as f:
        data = f.read()
    ref = parse_in_bytes(data)
    nat = _native.load_problem(path)
    assert nat is not None
    assert (nat.iters, nat.alpha, nat.features, nat.users, nat.items) == (
        ref.iters,
        ref.alpha,
        ref.features,
        ref.users,
        ref.items,
    )
    np.testing.assert_array_equal(nat.rows, ref.rows)
    np.testing.assert_array_equal(nat.cols, ref.cols)
    np.testing.assert_array_equal(nat.vals, ref.vals)


def test_load_problem_uses_native(tmp_path):
    # load_problem routes through the native parser when available and
    # produces the same spec as the pure-numpy path.
    spec = load_problem(fixture_path("inst2.in"))
    with open(fixture_path("inst2.in"), "rb") as f:
        ref = parse_in_bytes(f.read())
    np.testing.assert_array_equal(spec.vals, ref.vals)


def test_native_format_entries_roundtrip():
    rng = np.random.default_rng(3)
    rows = np.sort(rng.integers(0, 50, 200)).astype(np.int32)
    cols = rng.integers(0, 70, 200).astype(np.int32)
    vals = np.round(rng.uniform(0, 5, 200), 6)
    out = _native.format_entries(rows, cols, vals)
    assert out is not None
    lines = out.decode().splitlines()
    assert len(lines) == 200
    ref_lines = [f"{r} {c} {v:.6f}" for r, c, v in zip(rows, cols, vals)]
    assert lines == ref_lines
