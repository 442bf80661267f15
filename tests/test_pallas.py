"""Pallas dense-GD kernels vs the jnp/numpy reference (interpret mode on
the CPU test mesh; the same kernels compile with Mosaic on real TPU).

The resident kernels use the K-major factor layout (Lt (K,U), Rt (K,I),
K a sublane multiple); the tiled kernels keep the lane-major (U,K128)
layout. Helpers below convert between them at the boundary."""

import numpy as np
import pytest

from recsys_tpu.engine.oracle import factorize_numpy
from recsys_tpu.io.generator import generate_instance
from recsys_tpu.ops.pallas_dense import (
    mask_is_implicit,
    pad_factors_lane_major,
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
    Lt, Rt, A, (U, I, K) = pad_for_pallas(small_spec, strip=128)
    assert Lt.shape == (K, U) and Rt.shape == (K, I) and K == 16  # k=10 -> 16, not 128
    Ltp, Rtp = resident_train(Lt, Rt, A, iters=5, alpha2=2 * small_spec.alpha, strip=128)
    ref = _reference_factors(small_spec, 5)
    np.testing.assert_allclose(
        np.asarray(Ltp)[: small_spec.features, : small_spec.users].T, ref.L, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Rtp)[: small_spec.features, : small_spec.items].T, ref.R, rtol=2e-4, atol=2e-5
    )
    # Padded rows/cols must stay exactly zero (self-masking padding).
    assert np.all(np.asarray(Ltp)[:, small_spec.users :] == 0)
    assert np.all(np.asarray(Rtp)[:, small_spec.items :] == 0)
    assert np.all(np.asarray(Ltp)[small_spec.features :] == 0)


def test_tiled_matches_oracle(small_spec):
    L, R, (U, I, K) = pad_factors_lane_major(small_spec, strip=128, u_mult=16)
    A = np.zeros((U, I), np.float32)
    A[small_spec.rows, small_spec.cols] = small_spec.vals
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
    Lt, Rt, A, (U, I, K) = pad_for_pallas(small_spec, strip=128)
    Lt1, Rt1 = resident_train(Lt, Rt, A, iters=2, alpha2=2 * small_spec.alpha, strip=128)
    L2, R2, (U2, I2, K2) = pad_factors_lane_major(small_spec, strip=128, u_mult=16)
    A2 = np.zeros((U2, I2), np.float32)
    A2[small_spec.rows, small_spec.cols] = small_spec.vals
    for _ in range(2):
        L2, R2 = tiled_gd_step(L2, R2, A2, np.float32(2 * small_spec.alpha), bu=16, bi=128)
    u, i, k = small_spec.users, small_spec.items, small_spec.features
    np.testing.assert_allclose(
        np.asarray(Lt1)[:k, :u].T, np.asarray(L2)[:u, :k], rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(Rt1)[:k, :i].T, np.asarray(R2)[:i, :k], rtol=1e-5, atol=1e-7
    )


def test_resident_fits_budget():
    big = generate_instance(4000, 4000, 8, 1, 2, iters=1, alpha=0.01, seed=1)
    assert not resident_fits(big)  # 4096x4096 f32 A alone is 64 MB
    small = generate_instance(500, 500, 8, 1, 2, iters=1, alpha=0.01, seed=1)
    assert resident_fits(small)


def test_resident_top1_matches_oracle(small_spec):
    from recsys_tpu.engine.oracle import top1_numpy
    from recsys_tpu.ops.pallas_dense import resident_train_top1

    Lt, Rt, A, _ = pad_for_pallas(small_spec, strip=128)
    Ltp, Rtp, top1 = resident_train_top1(
        Lt, Rt, A, iters=5, alpha2=2 * small_spec.alpha, strip=128,
        items_true=small_spec.items,
    )
    ref = _reference_factors(small_spec, 5)
    want = top1_numpy(np.asarray(ref.L), np.asarray(ref.R), small_spec)
    np.testing.assert_array_equal(
        np.asarray(top1)[0, : small_spec.users], want
    )


def test_resident_top1_tie_break_lowest_index():
    # All-equal factors: every prediction ties; lowest item index must win.
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas_dense import resident_train_top1

    U, I, K = 128, 128, 8
    Lt = np.ones((K, U), np.float32)
    Rt = np.ones((K, I), np.float32)
    A = np.zeros((U, I), np.float32)  # nothing rated
    _, _, top1 = resident_train_top1(
        jnp.asarray(Lt), jnp.asarray(Rt), jnp.asarray(A),
        iters=0, alpha2=0.0, strip=128, items_true=I,
    )
    np.testing.assert_array_equal(np.asarray(top1)[0, :], np.zeros(U, np.int32))


def test_resident_many_strips_matches_oracle():
    """n_strips > 4 switches the strip walk from static unroll to
    fori_loop (the spill guard); both the training loop and the fused
    top-1 must agree with the oracle through that branch."""
    from recsys_tpu.engine.oracle import top1_numpy
    from recsys_tpu.ops.pallas_dense import resident_train_top1

    spec = generate_instance(32, 700, 8, 2, 8, iters=4, alpha=0.01, seed=7)
    Lt, Rt, A, (U, I, K) = pad_for_pallas(spec, strip=128)
    assert I // 128 > 4  # 700 -> 768 lanes: 6 strips, fori_loop branch
    Ltp, Rtp, top1 = resident_train_top1(
        Lt, Rt, A, iters=4, alpha2=2 * spec.alpha, strip=128, items_true=spec.items
    )
    ref = _reference_factors(spec, 4)
    np.testing.assert_allclose(
        np.asarray(Ltp)[: spec.features, : spec.users].T, ref.L, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Rtp)[: spec.features, : spec.items].T, ref.R, rtol=2e-4, atol=2e-5
    )
    want = top1_numpy(np.asarray(ref.L), np.asarray(ref.R), spec)
    np.testing.assert_array_equal(np.asarray(top1)[0, : spec.users], want)


def test_stream_equals_resident_bitwise(small_spec):
    """The grid-streamed kernel walks the same strips in the same order
    with the same arithmetic as the resident kernel — factors must come
    out BIT-identical."""
    from recsys_tpu.ops.pallas_dense import stream_train

    Lt, Rt, A, _ = pad_for_pallas(small_spec, strip=128)
    La, Ra = resident_train(Lt, Rt, A, iters=5, alpha2=2 * small_spec.alpha, strip=128)
    Lb, Rb = stream_train(Lt, Rt, A, iters=5, alpha2=2 * small_spec.alpha, strip=128)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))
    np.testing.assert_array_equal(np.asarray(Ra), np.asarray(Rb))


def test_stream_many_strips_matches_oracle():
    """The streamed kernel's home regime: n_strips > 4 (where the
    resident kernel would spill or walk dynamic offsets).  Training and
    fused top-1 must match the oracle."""
    from recsys_tpu.engine.oracle import top1_numpy
    from recsys_tpu.ops.pallas_dense import stream_train_top1

    spec = generate_instance(32, 700, 8, 2, 8, iters=4, alpha=0.01, seed=7)
    Lt, Rt, A, (U, I, K) = pad_for_pallas(spec, strip=128)
    assert I // 128 > 4
    Ltp, Rtp, top1 = stream_train_top1(
        Lt, Rt, A, iters=4, alpha2=2 * spec.alpha, strip=128, items_true=spec.items
    )
    ref = _reference_factors(spec, 4)
    np.testing.assert_allclose(
        np.asarray(Ltp)[: spec.features, : spec.users].T, ref.L, rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(Rtp)[: spec.features, : spec.items].T, ref.R, rtol=2e-4, atol=2e-5
    )
    want = top1_numpy(np.asarray(ref.L), np.asarray(ref.R), spec)
    np.testing.assert_array_equal(np.asarray(top1)[0, : spec.users], want)


def test_stream_split_top1_equals_fused():
    """The standalone ``stream_top1`` (the engine's stream route since
    round 5 — predicating the fused kernel's train body measured 16-24%
    per iteration at ML1M shape) computes the identical recommendation:
    same per-strip reconstruction, same running strictly-greater max."""
    from recsys_tpu.ops.pallas_dense import stream_top1, stream_train, stream_train_top1

    spec = generate_instance(32, 700, 8, 2, 8, iters=4, alpha=0.01, seed=7)
    Lt, Rt, A, (U, I, K) = pad_for_pallas(spec, strip=128)
    Ltf, Rtf, top_fused = stream_train_top1(
        Lt, Rt, A, iters=4, alpha2=2 * spec.alpha, strip=128, items_true=spec.items
    )
    Lts, Rts = stream_train(Lt, Rt, A, iters=4, alpha2=2 * spec.alpha, strip=128)
    np.testing.assert_array_equal(np.asarray(Ltf), np.asarray(Lts))  # same training
    top_split = stream_top1(
        Lts, Rts, A, strip=128, items_true=spec.items
    )
    np.testing.assert_array_equal(np.asarray(top_split), np.asarray(top_fused))


def test_stream_bf16_a_storage(small_spec):
    """bf16-stored A must leave results unchanged when every rating
    round-trips (error math stays f32)."""
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas_dense import stream_train, vals_bf16_exact

    assert vals_bf16_exact(small_spec)
    Lt, Rt, A, _ = pad_for_pallas(small_spec, strip=128)
    La, Ra = stream_train(Lt, Rt, A, iters=3, alpha2=2 * small_spec.alpha, strip=128)
    Lb, Rb = stream_train(
        Lt, Rt, jnp.asarray(A, jnp.bfloat16), iters=3,
        alpha2=2 * small_spec.alpha, strip=128,
    )
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))
    np.testing.assert_array_equal(np.asarray(Ra), np.asarray(Rb))


def test_int8_a_storage_bit_identical(small_spec):
    """int8 A (2x-rating storage, exact x0.5 dequant) must reproduce the
    f32-A results bit-for-bit in both fused kernels."""
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas_dense import (
        device_dense_AT,
        stream_train,
        vals_int8_exact,
    )

    assert vals_int8_exact(small_spec)
    Lt, Rt, A, (U, I, K) = pad_for_pallas(small_spec, strip=128)
    A8 = device_dense_AT(small_spec, U, I, dtype=jnp.int8)
    assert A8.dtype == jnp.int8
    np.testing.assert_array_equal(
        np.asarray(A8, np.float32) * 0.5, np.asarray(A)
    )
    La, Ra = resident_train(Lt, Rt, A, iters=4, alpha2=2 * small_spec.alpha, strip=128)
    Lb, Rb = resident_train(Lt, Rt, A8, iters=4, alpha2=2 * small_spec.alpha, strip=128)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))
    np.testing.assert_array_equal(np.asarray(Ra), np.asarray(Rb))
    Lc, Rc = stream_train(Lt, Rt, A8, iters=4, alpha2=2 * small_spec.alpha, strip=128)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lc))
    np.testing.assert_array_equal(np.asarray(Ra), np.asarray(Rc))


def test_vals_int8_exact_gates():
    import dataclasses

    from recsys_tpu.ops.pallas_dense import vals_int8_exact

    spec = generate_instance(8, 8, 4, 1, 3, iters=1, alpha=0.01, seed=3)
    assert vals_int8_exact(spec)  # integer star ratings
    bad = dataclasses.replace(spec, vals=spec.vals + np.float64(0.25))
    assert not vals_int8_exact(bad)  # quarter-star: 2x not integral
    big = dataclasses.replace(spec, vals=spec.vals * 100.0)
    assert not vals_int8_exact(big)  # overflows int8


def test_stream_top1_tie_break_lowest_index():
    import jax.numpy as jnp

    from recsys_tpu.ops.pallas_dense import stream_train_top1

    U, I, K = 128, 128, 8
    Lt = np.ones((K, U), np.float32)
    Rt = np.ones((K, I), np.float32)
    A = np.zeros((U, I), np.float32)
    _, _, top1 = stream_train_top1(
        jnp.asarray(Lt), jnp.asarray(Rt), jnp.asarray(A),
        iters=0, alpha2=0.0, strip=128, items_true=I,
    )
    np.testing.assert_array_equal(np.asarray(top1)[0, :], np.zeros(U, np.int32))


def test_strip_candidates_lane_aligned():
    """Strips must be 128-lane multiples (the Rt slice is a lane-dim
    slice; sublane-granular strips measured slower and crashed the
    remote compiler) — at most 4 per instance, ranked by item padding,
    and the error-tile cap keeps giant single strips out of the plan."""
    from recsys_tpu.engine import trainer
    from recsys_tpu.ops.pallas_dense import ETILE_CAP_BYTES, strip_candidates

    for users, items in [(943, 1682), (6040, 3952), (600, 10000), (3, 5)]:
        spec = generate_instance(users, items, 8, 1, 3, iters=1, alpha=0.01, seed=2)
        cands = strip_candidates(spec)
        assert 1 <= len(cands) <= 4
        for c in cands:
            assert c % 128 == 0 and c >= 128
        # Best candidate pads least: padding never exceeds 4*128 lanes
        # beyond the 128-rounded item count.
        best = cands[0]
        n = -(-(-(-items // 128) * 128) // best)
        assert n * best - items < 128 * 4 + 128
        kind, _, strip = trainer._pallas_plan(spec)
        if kind == "resident":
            u128 = -(-spec.users // 128) * 128
            assert 4 * u128 * strip <= ETILE_CAP_BYTES


def test_pallas_plan_dispatch():
    """_pallas_plan: small few-strip instances stay on the resident
    kernel; many-strip / big-A instances stream; factor tables beyond
    VMEM fall back to tiled."""
    from recsys_tpu.engine import trainer

    small = generate_instance(500, 500, 8, 1, 2, iters=1, alpha=0.01, seed=1)
    assert trainer._pallas_plan(small)[0] == "resident"
    # ML1M-ish shape: int8 A alone fits, but the 4-strip unroll keeps
    # four ~25 MB error tiles live — past the compiler's scoped-VMEM
    # cliff (measured: the resident compile crashes at this shape) —
    # so the live-tile estimate routes it to the streamed grid.
    wide = generate_instance(6040, 3952, 30, 1, 5, iters=1, alpha=0.01, seed=1)
    assert trainer._pallas_plan(wide)[0] == "stream"
    # Wide dense shape beyond the resident budget (A ~161 MB) whose
    # factor tables and (512, U) blocks still fit: streams.
    mid = generate_instance(8000, 20000, 16, 1, 5, iters=1, alpha=0.01, seed=1)
    assert trainer._pallas_plan(mid)[0] == "stream"
    # Huge user dimension: (strip, U) A blocks alone exceed VMEM -> tiled.
    tall = generate_instance(120000, 2000, 10, 1, 5, iters=1, alpha=0.01, seed=1)
    assert trainer._pallas_plan(tall)[0] == "tiled"


def test_pallas_plan_a_storage_compact_everywhere():
    """A-storage adjudication (round 5, trainer.A32_RESIDENT_CAP_BYTES):
    compact exact storage wins END-TO-END at every measured shape —
    engine-level per-iteration parity with f32 A but a 4x smaller upload
    through the remote attachment — so the plan keeps int8/bf16/f32 by
    exactness alone at every precision.  The f32-A gate exists but is
    disabled (cap 0); results are storage-invariant either way."""
    import jax.numpy as jnp

    from recsys_tpu.engine import trainer
    from recsys_tpu.io.parser import load_problem

    from helpers import FIXTURES

    assert trainer.A32_RESIDENT_CAP_BYTES == 0
    spec = load_problem(str(FIXTURES / "instML100k.in"))  # int8-exact ratings
    kind_h, a_h, _ = trainer._pallas_plan(spec, precision="highest")
    kind_3, a_3, _ = trainer._pallas_plan(spec, precision="bf16x3")
    assert kind_h == kind_3 == "resident"
    assert a_h == a_3 == jnp.int8
    big = load_problem(str(FIXTURES / "inst600-10000-10-40-400.in"))
    kind_b, a_b, _ = trainer._pallas_plan(big, precision="highest")
    assert kind_b == "resident"
    assert a_b == jnp.int8


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


def test_resident_bf16x3_accuracy_ladder(small_spec):
    """The 3-pass split product sits strictly between single-pass bf16
    and true-f32: its factor error vs the f64 oracle must be far below
    "default"'s and within a small multiple of "highest"'s."""
    ref = _reference_factors(small_spec, 5)

    def err(precision):
        Lt, Rt, A, _ = pad_for_pallas(small_spec, strip=128)
        Ltp, _ = resident_train(
            Lt, Rt, A, iters=5, alpha2=2 * small_spec.alpha, strip=128,
            precision=precision,
        )
        L = np.asarray(Ltp)[: small_spec.features, : small_spec.users].T
        return float(np.max(np.abs(L - ref.L)))

    import jax

    e_hi, e_3, e_lo = err("highest"), err("bf16x3"), err("default")
    assert e_3 <= 64 * max(e_hi, 1e-9), (e_hi, e_3, e_lo)
    if jax.default_backend() == "tpu":
        # On CPU "default" is full f32 (no MXU pass semantics), so the
        # lower rung only exists on real hardware.
        assert e_3 < e_lo / 4, (e_hi, e_3, e_lo)
    # The split product is genuinely lossy everywhere (the _bsplit
    # rounding happens in the kernel): ~16-bit-mantissa accurate, far
    # tighter than 1e-3 vs the f64 oracle after 5 iters.
    assert 0 < e_3 < 1e-3


def test_run_golden_bf16x3(small_spec):
    """Full run() through the fused kernel with the 3-pass split product
    still reproduces the oracle's top-1 output exactly."""
    import dataclasses

    from recsys_tpu.config import RunConfig
    from recsys_tpu.engine import trainer
    from recsys_tpu.engine.oracle import run_oracle

    spec = dataclasses.replace(small_spec, iters=20)
    out, _ = trainer.run(spec, RunConfig(dtype="float32", path="pallas", precision="bf16x3"))
    assert out == run_oracle(spec)
