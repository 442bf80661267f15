"""TPU microbench: in-kernel lane dynamic_gather + lane cumsum throughput.

Decides the design of the resident sparse kernel (round-2 item 1):
- jnp.take_along_axis(tab, idx, axis=1) with idx.shape == tab.shape is the
  only gather form Mosaic lowers; measure elements/s at several widths.
- jnp.cumsum(x, axis=1) in-kernel (lane scan) as the segment-sum substrate.

Small shapes only; every kernel loops internally to amortize dispatch.
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

T = 512  # inner iterations per kernel


def gather_kernel(tab_ref, idx_ref, out_ref, *, t):
    def body(i, c):
        g = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
        out_ref[:] = out_ref[:] * 0.5 + g
        return c

    out_ref[:] = jnp.zeros_like(out_ref)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(t), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("t",))
def run_gather(tab, idx, t):
    return pl.pallas_call(
        functools.partial(gather_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct(tab.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(tab, idx)


def cumsum_kernel(x_ref, out_ref, *, t):
    def body(i, c):
        out_ref[:] = out_ref[:] * 0.0 + jnp.cumsum(x_ref[:], axis=1)
        return c

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(t), body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("t",))
def run_cumsum(x, t):
    return pl.pallas_call(
        functools.partial(cumsum_kernel, t=t),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def bench(fn, *args, reps=3):
    # perturb + force transfer: the attachment memoizes identical executions
    best = float("inf")
    for r in range(reps):
        a0 = args[0] + np.float32(r) if args[0].dtype == jnp.float32 else args[0]
        t0 = time.perf_counter()
        out = fn(a0, *args[1:])
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # correctness first (small, one compile)
    S, W = 8, 512
    tab = jnp.asarray(rng.standard_normal((S, W)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, W, (S, W)), jnp.int32)
    out = np.asarray(run_gather(tab, idx, 2))
    # after 2 iters with out = out*0.5 + g: expect 1.5*g
    expect = 1.5 * np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    ok = np.allclose(out, expect, rtol=1e-6)
    print(f"gather correctness (full-width idx, W={W}): {ok}", flush=True)
    if not ok:
        print("  max err:", np.abs(out - expect).max(), flush=True)

    # broadcast same idx across sublanes (our real pattern)
    idx_b = jnp.broadcast_to(idx[:1], (S, W)).astype(jnp.int32)
    out = np.asarray(run_gather(tab, jnp.asarray(idx_b), 2))
    expect = 1.5 * np.take_along_axis(np.asarray(tab), np.asarray(idx_b), axis=1)
    print("gather correctness (broadcast idx):", np.allclose(out, expect, rtol=1e-6), flush=True)

    for (S, W) in [(8, 2048), (8, 8192), (24, 8192), (8, 32768)]:
        tab = jnp.asarray(rng.standard_normal((S, W)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, W, (S, W)), jnp.int32)
        dt = bench(run_gather, tab, idx, T)
        elems = S * W * T
        print(f"gather (S={S}, W={W}): {dt*1e3:.2f} ms for {T} iters -> "
              f"{elems/dt/1e9:.2f} G elem/s", flush=True)

    for (S, W) in [(8, 8192), (24, 8192), (8, 32768)]:
        x = jnp.asarray(rng.standard_normal((S, W)), jnp.float32)
        dt = bench(run_cumsum, x, T)
        elems = S * W * T
        print(f"cumsum axis=1 (S={S}, W={W}): {dt*1e3:.2f} ms for {T} iters -> "
              f"{elems/dt/1e9:.2f} G elem/s", flush=True)


if __name__ == "__main__":
    main()
