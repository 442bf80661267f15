"""Dual-ELL sparse path vs the oracle and the dense path."""

import dataclasses

import numpy as np
import pytest

from recsys_tpu.config import RunConfig
from recsys_tpu.engine import trainer
from recsys_tpu.engine.oracle import factorize_numpy
from recsys_tpu.io.generator import generate_instance
from recsys_tpu.io.parser import load_problem
from recsys_tpu.ops.ell import ell_fits, ell_ratios, make_ell_inputs

from helpers import FIXTURES


@pytest.fixture(scope="module")
def sparse_spec():
    # 2-5 entries per row over 200 items: the inst50000-5000 shape in miniature.
    return generate_instance(60, 200, 8, 2, 5, iters=10, alpha=0.01, seed=9)


def test_ell_tables_roundtrip(sparse_spec):
    d = make_ell_inputs(sparse_spec)
    # Every real entry appears exactly once in the row table...
    assert int(d.valid.sum()) == sparse_spec.nnz
    got = d.vals[sparse_spec.rows, :][d.valid[sparse_spec.rows, :] > 0]
    # ...and the column table indexes back into the row-ELL layout.
    assert int(d.validT.sum()) == sparse_spec.nnz
    flat_vals = d.vals.reshape(-1)[d.slotT]
    assert np.all((flat_vals * d.validT)[d.validT > 0] > 0)


def test_ell_matches_oracle(sparse_spec):
    ref, _ = factorize_numpy(sparse_spec)
    st = trainer.factorize(sparse_spec, RunConfig(dtype="float64", path="ell"))
    np.testing.assert_allclose(np.asarray(st.L), ref.L, rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(st.R), ref.R, rtol=1e-12, atol=1e-14)


def test_ell_equals_dense_path(sparse_spec):
    st_e = trainer.factorize(sparse_spec, RunConfig(dtype="float32", path="ell"))
    st_d = trainer.factorize(sparse_spec, RunConfig(dtype="float32", path="dense"))
    np.testing.assert_allclose(np.asarray(st_e.L), np.asarray(st_d.L), rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(st_e.R), np.asarray(st_d.R), rtol=3e-5, atol=3e-6)


def test_ell_golden_inst30():
    spec = load_problem(str(FIXTURES / "inst30-40-10-2-10.in"))
    cfg = RunConfig(dtype="float64", path="ell")
    out, _ = trainer.run(spec, cfg)
    golden = open(FIXTURES / "inst30-40-10-2-10.out").read()
    assert out == golden


def test_choose_path_prefers_sparse_for_sparse():
    spec = generate_instance(2000, 2000, 4, 2, 4, iters=1, alpha=0.01, seed=2)
    assert ell_fits(spec)
    assert trainer.choose_path(spec, RunConfig(dtype="float32")) == "coo"


def test_choose_path_keeps_dense_for_dense_instances():
    # ~25% density: padding ratios fine but dense work is comparable.
    spec = generate_instance(64, 64, 4, 12, 20, iters=1, alpha=0.01, seed=2)
    assert trainer.choose_path(spec, RunConfig(dtype="float32")) in ("dense", "pallas")


def test_ell_ratios_power_law_fallback():
    # One superstar item rated by everyone: column ratio explodes.
    rows = np.arange(500, dtype=np.int32)
    cols = np.zeros(500, dtype=np.int32)
    vals = np.ones(500)
    spec = dataclasses.replace(
        generate_instance(500, 400, 4, 1, 1, iters=1, alpha=0.01, seed=3),
        rows=rows, cols=cols, vals=vals,
    )
    _, cr = ell_ratios(spec)
    assert cr > 4.0
    assert not ell_fits(spec)
