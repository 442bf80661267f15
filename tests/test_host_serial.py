"""Native host-serial engine (rs_serial_gd) — the sub-dispatch-floor path.

The reference's serial driver (``matFact.c:29-59``) owns the regime
where problems are too small to amortize any parallel machinery; this
framework's analogue is a native sequential trajectory that bypasses
device dispatch entirely.  Its contract is the strongest in the repo:
bit-identical f64 trajectories to the reference binary (same operation
order, FP contraction disabled), pinned here against the ``.mats``
per-iteration dumps and the argmax goldens.
"""

import dataclasses

import numpy as np
import pytest

from recsys_tpu.config import RunConfig
from recsys_tpu.engine import trainer
from recsys_tpu.engine.oracle import factorize_numpy
from recsys_tpu.io import _native
from recsys_tpu.io.parser import load_problem

from helpers import FIXTURES, assert_mats_close, parse_mats, read_golden

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable"
)

TOYS = ["inst0", "inst1", "inst2", "inst30-40-10-2-10"]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_host_path_selected_for_toys(dtype):
    for inst in TOYS:
        spec = load_problem(FIXTURES / f"{inst}.in")
        assert trainer.choose_path(spec, RunConfig(dtype=dtype)) == "host", inst
    ml = load_problem(FIXTURES / "instML100k.in")
    assert trainer.choose_path(ml, RunConfig(dtype=dtype)) != "host"
    # The sharded engine never sees "host".
    assert trainer.choose_path(spec, RunConfig(dtype=dtype), allow_host=False) != "host"


@pytest.mark.parametrize("inst", TOYS)
@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_host_serial_golden(inst, dtype):
    """Auto-routed toy runs are byte-exact for EVERY dtype (the engine
    computes f64 regardless — strictly tighter than the speed modes)."""
    spec = load_problem(FIXTURES / f"{inst}.in")
    out, _ = trainer.run(spec, RunConfig(dtype=dtype))
    assert out == read_golden(inst)


@pytest.mark.parametrize("inst", ["inst0", "inst1", "inst2", "inst30-40-10-2-10"])
def test_host_serial_trajectory_matches_mats(inst):
    """Per-iteration L/R/B match the reference's debug dumps — including
    inst30-40 after its full 20000 iterations, where the matrix-form
    oracle drifts past print precision (summation order): the native
    engine reproduces the reference's exact sequential order."""
    import os

    if not os.path.exists(FIXTURES / f"{inst}.mats"):
        pytest.skip(f"no .mats dump for {inst}")
    spec = load_problem(FIXTURES / f"{inst}.in")
    mats = parse_mats(FIXTURES / f"{inst}.mats")
    one = dataclasses.replace(spec, iters=1)
    state = None
    for n, dump in enumerate(mats["iters"]):
        state = trainer._factorize_host_serial(one, state=state)
        assert_mats_close(np.asarray(state.L), dump["L"], f"{inst} iter{n} L")
        assert_mats_close(np.asarray(state.R), dump["R"].T, f"{inst} iter{n} R")
    fin = mats["final"]
    state = trainer._factorize_host_serial(spec)
    assert_mats_close(np.asarray(state.L), fin["L"], f"{inst} final L")
    assert_mats_close(np.asarray(state.R), fin["R"].T, f"{inst} final R")
    assert_mats_close(
        np.asarray(state.L) @ np.asarray(state.R).T, fin["B"], f"{inst} final B"
    )


def test_host_serial_close_to_oracle():
    """Same math as the matrix-form oracle, different summation order:
    agreement to ~1e-12 over a non-trivial instance."""
    from recsys_tpu.io.generator import generate_instance

    spec = generate_instance(40, 30, 6, 1, 8, iters=50, alpha=0.01, seed=17)
    ref, _ = factorize_numpy(spec)
    st = trainer._factorize_host_serial(spec)
    np.testing.assert_allclose(np.asarray(st.L), ref.L, rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(st.R), ref.R, rtol=1e-11, atol=1e-13)


def test_host_serial_does_not_mutate_state():
    from recsys_tpu.io.generator import generate_instance
    from recsys_tpu.models.mf import init_factors

    spec = generate_instance(10, 8, 3, 1, 4, iters=3, alpha=0.01, seed=5)
    state = init_factors(spec.users, spec.items, spec.features)
    L0, R0 = state.L.copy(), state.R.copy()
    trainer._factorize_host_serial(spec, state=state)
    np.testing.assert_array_equal(state.L, L0)
    np.testing.assert_array_equal(state.R, R0)
