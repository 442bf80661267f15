"""Pallas dense-GD kernels vs the jnp/numpy reference (interpret mode on
the CPU test mesh; the same kernels compile with Mosaic on real TPU)."""

import numpy as np
import pytest

from recsys_tpu.engine.oracle import factorize_numpy
from recsys_tpu.io.generator import generate_instance
from recsys_tpu.models.mf import init_factors
from recsys_tpu.ops.pallas_dense import (
    mask_is_implicit,
    pad_for_pallas,
    resident_fits,
    resident_train,
    tiled_gd_step,
)


@pytest.fixture(scope="module")
def small_spec():
    return generate_instance(32, 40, 10, 2, 8, iters=5, alpha=0.01, seed=11)


def _reference_factors(spec, iters):
    import dataclasses

    state, _ = factorize_numpy(dataclasses.replace(spec, iters=iters))
    return state


def test_mask_is_implicit(small_spec):
    assert mask_is_implicit(small_spec)


def test_resident_matches_oracle(small_spec):
    L, R, A, (U, I, K) = pad_for_pallas(small_spec, strip=128)
    Lp, Rp = resident_train(L, R, A, iters=5, alpha2=2 * small_spec.alpha, strip=128)
    ref = _reference_factors(small_spec, 5)
    np.testing.assert_allclose(
        np.asarray(Lp)[: small_spec.users, : small_spec.features], ref.L, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Rp)[: small_spec.items, : small_spec.features], ref.R, rtol=2e-4, atol=2e-5
    )
    # Padded rows/cols must stay exactly zero (self-masking padding).
    assert np.all(np.asarray(Lp)[small_spec.users :] == 0)
    assert np.all(np.asarray(Rp)[small_spec.items :] == 0)
    assert np.all(np.asarray(Lp)[:, small_spec.features :] == 0)


def test_tiled_matches_oracle(small_spec):
    L, R, A, (U, I, K) = pad_for_pallas(small_spec, strip=128)
    Lp, Rp = L, R
    for _ in range(3):
        Lp, Rp = tiled_gd_step(Lp, Rp, A, np.float32(2 * small_spec.alpha), bu=16, bi=128)
    ref = _reference_factors(small_spec, 3)
    np.testing.assert_allclose(
        np.asarray(Lp)[: small_spec.users, : small_spec.features], ref.L, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Rp)[: small_spec.items, : small_spec.features], ref.R, rtol=2e-4, atol=2e-5
    )


def test_tiled_equals_resident(small_spec):
    L, R, A, _ = pad_for_pallas(small_spec, strip=128)
    L1, R1 = resident_train(L, R, A, iters=2, alpha2=2 * small_spec.alpha, strip=128)
    L2, R2 = L, R
    for _ in range(2):
        L2, R2 = tiled_gd_step(L2, R2, A, np.float32(2 * small_spec.alpha), bu=16, bi=128)
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), rtol=1e-5, atol=1e-7)


def test_resident_fits_budget():
    big = generate_instance(4000, 4000, 8, 1, 2, iters=1, alpha=0.01, seed=1)
    assert not resident_fits(big)  # 4096x4096 f32 A alone is 64 MB
    small = generate_instance(500, 500, 8, 1, 2, iters=1, alpha=0.01, seed=1)
    assert resident_fits(small)


def test_resident_top1_matches_oracle(small_spec):
    from recsys_tpu.engine.oracle import top1_numpy
    from recsys_tpu.ops.pallas_dense import resident_train_top1

    L, R, A, _ = pad_for_pallas(small_spec, strip=128)
    Lp, Rp, top1 = resident_train_top1(
        L, R, A, iters=5, alpha2=2 * small_spec.alpha, strip=128,
        items_true=small_spec.items,
    )
    ref = _reference_factors(small_spec, 5)
    want = top1_numpy(np.asarray(ref.L), np.asarray(ref.R), small_spec)
    np.testing.assert_array_equal(
        np.asarray(top1)[: small_spec.users, 0], want
    )


def test_resident_top1_tie_break_lowest_index():
    # All-equal factors: every prediction ties; lowest item index must win.
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas_dense import resident_train_top1

    U, I, K = 8, 128, 128
    L = np.ones((U, K), np.float32)
    R = np.ones((I, K), np.float32)
    A = np.zeros((U, I), np.float32)  # nothing rated
    _, _, top1 = resident_train_top1(
        jnp.asarray(L), jnp.asarray(R), jnp.asarray(A),
        iters=0, alpha2=0.0, strip=128, items_true=I,
    )
    np.testing.assert_array_equal(np.asarray(top1)[:, 0], np.zeros(U, np.int32))


def test_run_uses_fused_kernel_golden(small_spec):
    """trainer.run on a resident-size instance must still match the
    oracle output through the fused path (interpret mode on CPU)."""
    import dataclasses

    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.engine.oracle import run_oracle

    spec = dataclasses.replace(small_spec, iters=20)
    out, _ = trainer.run(spec, RunConfig(dtype="float32", path="pallas"))
    assert out == run_oracle(spec)
