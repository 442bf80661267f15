#!/usr/bin/env python3
"""Prototype: grid-streamed kernel with STRIP-PACKED R tables.

HISTORICAL (round 3): written against the round-3 stream kernel, whose
A operand was (U, I).  Round 4 transposed the stream kernel's A to
(I, U) and removed the Lu transpose, so the in-script v2 kernel and the
bit-identity A/B below no longer run against the current stream_train;
the experiment's committed conclusions (bench_logs) stand on the old
layout.  Kept for the record.

Hypothesis (from ML1M/inst200-10000 probes): the stream kernel's
~60 us/grid-step overhead is the dynamic LANE-dimension dslice into the
(K, I) factor table (rt read + dRt write).  Packing R as
(n_strips*K, strip) moves every dynamic slice to the SUBLANE dimension
(contiguous block offset), which Mosaic addresses cheaply.

Validates bit-identity vs pd.stream_train in interpret mode, then (on
TPU) A/Bs per-iter time at ML1M shape and inst200-10000 shape.

Usage: python scripts/probe_stream_v2.py [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from recsys_tpu.ops import pallas_dense as pd


def _interpret():
    return jax.default_backend() != "tpu"


def _v2_kernel(Lt_ref, Rp_ref, A_ref, Ltout_ref, Rpout_ref, dLt_ref, dRp_ref, Lu_ref, *, n_strips, strip, K, alpha2, precision):
    it = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(jnp.logical_and(it == 0, s == 0))
    def _():
        Ltout_ref[:] = Lt_ref[:]
        Rpout_ref[:] = Rp_ref[:]

    @pl.when(s == 0)
    def _():
        Lu_ref[:] = Ltout_ref[:].T
        dLt_ref[:] = jnp.zeros_like(dLt_ref)

    a = A_ref[:].astype(jnp.float32)
    if A_ref.dtype == jnp.int8:
        a = a * jnp.float32(0.5)
    # SUBLANE-dynamic slice: rows s*K .. s*K+K of the packed table.
    rt = Rpout_ref[pl.dslice(s * K, K), :]  # (K, strip)

    pred = jax.lax.dot_general(
        Lu_ref[:], rt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    e = jnp.where(a != 0.0, a - pred, 0.0)
    dLt_ref[:] += jax.lax.dot_general(
        rt, e, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    dRp_ref[pl.dslice(s * K, K), :] = jax.lax.dot_general(
        Ltout_ref[:], e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(s == n_strips - 1)
    def _():
        Ltout_ref[:] = Ltout_ref[:] + alpha2 * dLt_ref[:]
        Rpout_ref[:] = Rpout_ref[:] + alpha2 * dRp_ref[:]


@functools.partial(jax.jit, static_argnames=("iters", "alpha2", "strip", "precision"))
def stream_v2_train(Lt, Rp, A, *, iters, alpha2, strip, precision="highest"):
    """Lt: (K, U); Rp: (n_strips*K, strip) packed; A: (U, n_strips*strip)."""
    K, U = Lt.shape
    SK, _ = Rp.shape
    n_strips = SK // K
    kernel = functools.partial(
        _v2_kernel, n_strips=n_strips, strip=strip, K=K, alpha2=alpha2,
        precision=precision,
    )
    return pl.pallas_call(
        kernel,
        grid=(iters, n_strips),
        out_shape=(
            jax.ShapeDtypeStruct((K, U), jnp.float32),
            jax.ShapeDtypeStruct((SK, strip), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((K, U), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SK, strip), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((U, strip), lambda it, s: (0, s)),
        ],
        out_specs=(
            pl.BlockSpec((K, U), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SK, strip), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((K, U), jnp.float32),
            pltpu.VMEM((SK, strip), jnp.float32),
            pltpu.VMEM((U, K), jnp.float32),
        ],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=pd.VMEM_LIMIT_BYTES),
        interpret=_interpret(),
    )(Lt, Rp, A)


def pack_R(Rt, strip):
    """(K, I) -> (n_strips*K, strip)."""
    K, I = Rt.shape
    n = I // strip
    return np.ascontiguousarray(
        np.asarray(Rt).reshape(K, n, strip).transpose(1, 0, 2).reshape(n * K, strip)
    )


def unpack_R(Rp, K):
    SK, strip = Rp.shape
    n = SK // K
    return np.asarray(Rp).reshape(n, K, strip).transpose(1, 0, 2).reshape(K, n * strip)


def check_bitwise():
    from recsys_tpu.io.generator import generate_instance

    spec = generate_instance(40, 700, 8, 2, 8, iters=5, alpha=0.01, seed=7)
    strip = 128
    Lt, Rt, A, (U, I, K) = pd.pad_for_pallas(spec, strip=strip)
    La, Ra = pd.stream_train(jnp.asarray(Lt), jnp.asarray(Rt), jnp.asarray(A),
                             iters=5, alpha2=2 * spec.alpha, strip=strip)
    Rp = pack_R(Rt, strip)
    Lb, Rpb = stream_v2_train(jnp.asarray(Lt), jnp.asarray(Rp), jnp.asarray(A),
                              iters=5, alpha2=2 * spec.alpha, strip=strip)
    np.testing.assert_array_equal(np.asarray(La), np.asarray(Lb))
    np.testing.assert_array_equal(np.asarray(Ra), unpack_R(Rpb, K))
    print("bitwise OK (v2 == stream v1)", flush=True)


def time_shape(name, spec, iters, strip=512):
    Lt, Rt, (U, I, K) = pd.pad_factors_for_pallas(spec, strip=strip)
    A8 = pd.device_dense_AT(spec, U, I, dtype=jnp.int8)
    Rp = pack_R(Rt, strip)
    variants = [
        ("v1 stream", lambda L0, R0: pd.stream_train(
            L0, jnp.asarray(Rt) * R0, A8, iters=iters, alpha2=2 * spec.alpha, strip=strip)),
        ("v2 packed", lambda L0, R0: stream_v2_train(
            L0, jnp.asarray(Rp) * R0, A8, iters=iters, alpha2=2 * spec.alpha, strip=strip)),
    ]
    for vname, fn in variants:
        walls = []
        for rep in range(3):
            L0 = jnp.asarray(Lt) * (1.0 + 1e-7 * rep)
            t0 = time.perf_counter()
            L1, R1 = fn(L0, jnp.float32(1.0))
            s = float(np.asarray(L1[:1, :1])[0, 0])
            walls.append(time.perf_counter() - t0)
        print(
            f"{name} {vname}: min {min(walls):.4f}s / {iters} iters = "
            f"{1e3 * min(walls) / iters:.4f} ms/iter "
            f"({I // strip} strips, checksum {s:.6g})", flush=True,
        )


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    check_bitwise()
    if jax.default_backend() == "tpu":
        from recsys_tpu.io.parser import load_problem
        from recsys_tpu.io.generator import materialize_gen_fixture

        fix = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")
        p = os.path.join(fix, "gen-instML1M.in")
        if not os.path.exists(p):
            materialize_gen_fixture("gen-instML1M", fix)
        time_shape("ML1M", load_problem(p), iters)
        time_shape("inst200-10000", load_problem(os.path.join(fix, "inst200-10000-50-100-300.in")), iters)
