"""Ingest tests: .in parsing, round-trip, and validation errors."""

import numpy as np
import pytest

from recsys_tpu.io.parser import ParseError, load_problem, parse_in_bytes, save_problem

from helpers import FIXTURES


def test_parse_inst0():
    spec = load_problem(FIXTURES / "inst0.in")
    assert (spec.iters, spec.features) == (5000, 2)
    assert spec.alpha == 0.001
    assert (spec.users, spec.items, spec.nnz) == (3, 5, 7)
    np.testing.assert_array_equal(spec.rows, [0, 0, 1, 1, 2, 2, 2])
    np.testing.assert_array_equal(spec.cols, [0, 2, 2, 4, 1, 2, 3])
    np.testing.assert_array_equal(spec.vals, [2.0, 3.0, 3.0, 1.0, 5.0, 3.0, 4.0])


def test_parse_ml100k_header():
    spec = load_problem(FIXTURES / "instML100k.in")
    assert (spec.iters, spec.features, spec.users, spec.items, spec.nnz) == (
        3000, 30, 943, 1682, 100000,
    )
    # Row-major sortedness invariant of the format.
    order = np.lexsort((spec.cols, spec.rows))
    np.testing.assert_array_equal(order, np.arange(spec.nnz))


def test_dense_and_mask():
    spec = load_problem(FIXTURES / "inst0.in")
    A = spec.dense()
    assert A.shape == (3, 5)
    assert A[0, 0] == 2.0 and A[2, 1] == 5.0 and A[0, 1] == 0.0
    assert spec.mask().sum() == 7
    np.testing.assert_array_equal(spec.rated_counts(), [2, 2, 3])


def test_roundtrip(tmp_path):
    spec = load_problem(FIXTURES / "inst30-40-10-2-10.in")
    save_problem(spec, tmp_path / "rt.in")
    spec2 = load_problem(tmp_path / "rt.in")
    np.testing.assert_array_equal(spec.rows, spec2.rows)
    np.testing.assert_array_equal(spec.cols, spec2.cols)
    np.testing.assert_allclose(spec.vals, spec2.vals, atol=5e-7)


@pytest.mark.parametrize(
    "payload",
    [
        b"10\n0.1\n",  # truncated header
        b"10\n0.1\n2\n3 5 2\n0 0 1.0\n",  # too few entries
        b"10\n0.1\n2\n3 5 1\n0 9 1.0\n",  # col out of range
        b"0\n0.1\n2\n3 5 0\n",  # zero iters
    ],
)
def test_malformed_inputs_raise(payload):
    with pytest.raises(ParseError):
        parse_in_bytes(payload)
