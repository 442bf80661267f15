"""Numpy oracle vs the reference's .mats trajectories and golden outputs."""

import numpy as np
import pytest

from recsys_tpu.engine.oracle import factorize_numpy, run_oracle, top1_numpy
from recsys_tpu.io.parser import load_problem
from recsys_tpu.models.mf import init_factors

from helpers import FIXTURES, assert_mats_close, parse_mats, read_golden


@pytest.mark.parametrize("inst", ["inst0", "inst1", "inst2"])
def test_trajectory_matches_mats(inst):
    """First-5-iteration and final L/R/B match the reference dumps.

    This pins the update rule far more tightly than the argmax goldens:
    any deviation in the GD step shows up within one iteration.
    """
    spec = load_problem(FIXTURES / f"{inst}.in")
    mats = parse_mats(FIXTURES / f"{inst}.mats")

    state, traj = factorize_numpy(spec, record=len(mats["iters"]))
    for n, dump in enumerate(mats["iters"]):
        L, R = traj[n]
        assert_mats_close(L, dump["L"], f"{inst} iter{n} L")
        assert_mats_close(R, dump["R"].T, f"{inst} iter{n} R")
        if "B" in dump:
            assert_mats_close(L @ R.T, dump["B"], f"{inst} iter{n} B")

    fin = mats["final"]
    # inst0/1/2 run 5000-100000 iterations; fp64 matches to print precision.
    assert_mats_close(state.L, fin["L"], f"{inst} final L")
    assert_mats_close(state.R, fin["R"].T, f"{inst} final R")
    assert_mats_close(state.L @ state.R.T, fin["B"], f"{inst} final B")


@pytest.mark.parametrize("inst", ["inst0", "inst1", "inst2", "inst30-40-10-2-10"])
def test_golden_small(inst):
    spec = load_problem(FIXTURES / f"{inst}.in")
    assert run_oracle(spec) == read_golden(inst)


@pytest.mark.slow
def test_golden_mid_500x500():
    spec = load_problem(FIXTURES / "inst500-500-20-2-100.in")
    assert run_oracle(spec) == read_golden("inst500-500-20-2-100")


def test_tie_break_lowest_index():
    """Reference keeps the incumbent on ties => lowest index wins
    (matFact.c:17 uses strictly-greater)."""
    spec = load_problem(FIXTURES / "inst0.in")
    L = np.ones((3, 2))
    R = np.ones((5, 2))  # all predictions equal
    top1 = top1_numpy(L, R, spec)
    # user 0 rated items {0, 2} -> lowest unrated is 1; user 2 rated {1,2,3} -> 0
    np.testing.assert_array_equal(top1, [1, 0, 0])
