"""Checkpoint/resume: chunked training equals one uninterrupted run."""

import numpy as np

from recsys_tpu.config import RunConfig
from recsys_tpu.engine import trainer
from recsys_tpu.io.generator import generate_instance
from recsys_tpu.utils import checkpoint


def test_chunked_equals_straight(tmp_path):
    spec = generate_instance(20, 30, 4, 1, 5, iters=12, alpha=0.01, seed=5)
    cfg = RunConfig(dtype="float64", path="dense")
    straight = trainer.factorize(spec, cfg)
    path = str(tmp_path / "ck.npz")
    chunked = checkpoint.run_with_checkpoints(spec, cfg, path, every=5)
    np.testing.assert_array_equal(np.asarray(straight.L), np.asarray(chunked.L))
    np.testing.assert_array_equal(np.asarray(straight.R), np.asarray(chunked.R))


def test_resume_from_partial(tmp_path):
    spec = generate_instance(20, 30, 4, 1, 5, iters=12, alpha=0.01, seed=5)
    cfg = RunConfig(dtype="float64", path="dense")
    path = str(tmp_path / "ck.npz")
    # Simulate a run killed after 7 of 12 iterations...
    import dataclasses

    part = trainer.factorize(dataclasses.replace(spec, iters=7), cfg)
    checkpoint.save(path, part, 7)
    ck = checkpoint.load(path)
    assert ck.completed_iters == 7
    # ...then resume: must finish the remaining 5 and match straight-through.
    resumed = checkpoint.run_with_checkpoints(spec, cfg, path, every=100)
    straight = trainer.factorize(spec, cfg)
    np.testing.assert_array_equal(np.asarray(straight.L), np.asarray(resumed.L))


def test_save_is_atomic_overwrite(tmp_path):
    spec = generate_instance(10, 12, 3, 1, 3, iters=2, alpha=0.01, seed=1)
    st = trainer.factorize(spec, RunConfig(dtype="float64", path="dense"))
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, st, 1)
    checkpoint.save(path, st, 2)  # overwrite in place
    assert checkpoint.load(path).completed_iters == 2


def test_chunked_equals_straight_bell(tmp_path):
    """Checkpoint/resume through the BELL path: state round-trips
    through the degree permutation bit-exactly (f64), so chunked
    training equals the uninterrupted run byte-for-byte."""
    spec = generate_instance(30, 200, 6, 2, 5, iters=12, alpha=0.01, seed=9)
    cfg = RunConfig(dtype="float64", path="bell")
    straight = trainer.factorize(spec, cfg)
    path = str(tmp_path / "ck.npz")
    chunked = checkpoint.run_with_checkpoints(spec, cfg, path, every=5)
    np.testing.assert_array_equal(np.asarray(straight.L), np.asarray(chunked.L))
    np.testing.assert_array_equal(np.asarray(straight.R), np.asarray(chunked.R))
