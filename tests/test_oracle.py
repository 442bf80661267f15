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


def test_dump_mats_byte_exact_inst1_inst2():
    """The .mats debug dump reproduces the reference's dumps byte-for-byte
    (inst1/inst2 were dumped with no per-iteration recording)."""
    from recsys_tpu.engine.oracle import dump_mats
    from recsys_tpu.io.parser import load_problem

    for name in ("inst1", "inst2"):
        spec = load_problem(str(FIXTURES / f"{name}.in"))
        got = dump_mats(spec, record=0)
        ref = open(FIXTURES / f"{name}.mats").read()
        assert got == ref


def test_dump_mats_inst0_print_ulp():
    """inst0.mats records 5 iterations then the final state after 5000:
    all blocks byte-match except <=1-ulp-of-print drift in the final
    block (f64 summation-order difference vs the scalar reference loop)."""
    from recsys_tpu.engine.oracle import dump_mats
    from recsys_tpu.io.parser import load_problem

    spec = load_problem(str(FIXTURES / "inst0.in"))
    got = dump_mats(spec, record=5).splitlines()
    ref = open(FIXTURES / "inst0.mats").read().splitlines()
    assert len(got) == len(ref)
    n_diff = 0
    for g, r in zip(got, ref):
        if g == r:
            continue
        gv = [float(x) for x in g.split()]
        rv = [float(x) for x in r.split()]
        assert np.allclose(gv, rv, atol=1.5e-6, rtol=0)
        n_diff += 1
    assert n_diff <= 3
