#!/usr/bin/env python3
"""Map the XLA TPU row-gather engine: rate vs row width/dtype/layout.

probe_mosaic_gather.py established (a) in-kernel vector gathers do not
lower (Mosaic repro recorded) and (b) a fused XLA gather+reduce of
176k x 512 B rows runs at ~0.85 ms — ~110 GB/s of gathered bytes,
~1/7 of HBM peak — which exactly accounts for BELL's measured
1.646 ms/iter (352k rows/iter).  This probe maps what the engine CAN
do, to find a layout that beats 110 GB/s:

  k32/k128/k256/k512 : rate vs row width (rows/s vs GB/s limited?)
  bf16               : does halving row bytes halve time?
  int8               : ... quarter?
  split4             : 4 independent quarter-gathers in one program
  sorted             : sorted indices (locality) vs random
  dup                : indices with heavy duplication (degree hubs)

Every variant loops INNER times inside one program with a carried
dependency (relay dispatch ~30 ms).

Usage: python scripts/probe_gather_rate.py [variants...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

INTERPRET = bool(os.environ.get("PROBE_INTERPRET"))
N = 5001
S = 176_128
INNER = 2 if INTERPRET else 50

rng = np.random.default_rng(0)
IDX = rng.integers(0, N, S).astype(np.int32)


def make_loop(k, dtype, idx_np, split=1):
    table = jnp.asarray(rng.standard_normal((N, k)).astype(np.float32)).astype(dtype)
    idx = jnp.asarray(idx_np)
    parts = np.array_split(np.arange(S), split)
    idxs = [idx[p[0] : p[-1] + 1] for p in parts]

    def step(tab):
        outs = [tab[i].astype(jnp.float32).sum(axis=0) for i in idxs]
        return sum(outs)

    def body(_, carry):
        tab, acc = carry
        r = step(tab)
        return tab + (1e-20 * r[None, :]).astype(dtype), acc + r

    @jax.jit
    def fn(table):
        _, acc = jax.lax.fori_loop(0, INNER, body, (table, jnp.zeros(k, jnp.float32)))
        return acc

    return fn, table, S * k * jnp.dtype(dtype).itemsize / 1e9


def timeit(name, fn, table, gb):
    try:
        t0 = time.perf_counter()
        s = float(np.asarray(fn(table)).sum())
        first = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(table)).sum())
            walls.append(time.perf_counter() - t0)
        per = min(walls) / INNER
        print(
            f"{name}: {per * 1e3:.3f} ms ({gb / per:.0f} GB/s gathered, "
            f"{S / per / 1e6:.0f} M rows/s; first {first:.1f}s; sum {s:.4g})",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED — {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)


int8 = jnp.int8
VARIANTS = {
    "k32": lambda: make_loop(32, jnp.float32, IDX),
    "k128": lambda: make_loop(128, jnp.float32, IDX),
    "k256": lambda: make_loop(256, jnp.float32, IDX),
    "k512": lambda: make_loop(512, jnp.float32, IDX),
    "bf16": lambda: make_loop(128, jnp.bfloat16, IDX),
    "int8": lambda: make_loop(128, jnp.int8, IDX),
    "split4": lambda: make_loop(128, jnp.float32, IDX, split=4),
    "sorted": lambda: make_loop(128, jnp.float32, np.sort(IDX)),
    "dup": lambda: make_loop(128, jnp.float32, (IDX % 64).astype(np.int32)),
}



# --- f64 variants (run with JAX_ENABLE_X64=1): is the f64 gather op
# itself slow, and does a bit-exact f32-view gather recover the rate?
def make_f64_loop(k, bitcast_view):
    import jax
    table = jnp.asarray(rng.standard_normal((N, k)), dtype=jnp.float64)
    idx = jnp.asarray(IDX)

    def step(tab):
        if bitcast_view:
            t32 = jax.lax.bitcast_convert_type(tab, jnp.float32).reshape(N, 2 * k)
            g32 = t32[idx]
            g = jax.lax.bitcast_convert_type(g32.reshape(S, k, 2), jnp.float64)
        else:
            g = tab[idx]
        return g.sum(axis=0)

    def body(_, carry):
        tab, acc = carry
        r = step(tab)
        return tab + 1e-30 * r[None, :], acc + r

    @jax.jit
    def fn(table):
        _, acc = jax.lax.fori_loop(0, INNER, body, (table, jnp.zeros(k, jnp.float64)))
        return acc

    return fn, table, S * k * 8 / 1e9


def make_f64_view_loop(k, mode):
    """mode 'u32_3d': bitcast f64->(N,k,2) uint32, gather leading dim,
    bitcast back (no reshape near the gather).  mode 'u32_2d': with the
    (N,2k) reshape.  The f32 reshape form crashed the remote compiler
    (recorded); these probe which piece was fatal."""
    import jax
    table = jnp.asarray(rng.standard_normal((N, k)), dtype=jnp.float64)
    idx = jnp.asarray(IDX)

    def step(tab):
        t32 = jax.lax.bitcast_convert_type(tab, jnp.uint32)  # (N, k, 2)
        if mode == "u32_2d":
            t32 = t32.reshape(N, 2 * k)
            g = t32[idx].reshape(S, k, 2)
        else:
            g = t32[idx]  # (S, k, 2)
        return jax.lax.bitcast_convert_type(g, jnp.float64).sum(axis=0)

    def body(_, carry):
        tab, acc = carry
        r = step(tab)
        return tab + 1e-30 * r[None, :], acc + r

    @jax.jit
    def fn(table):
        _, acc = jax.lax.fori_loop(0, INNER, body, (table, jnp.zeros(k, jnp.float64)))
        return acc

    return fn, table, S * k * 8 / 1e9


if os.environ.get("JAX_ENABLE_X64"):
    VARIANTS["f64k32"] = lambda: make_f64_loop(32, False)
    VARIANTS["f64k32view"] = lambda: make_f64_loop(32, True)
    VARIANTS["f64k128"] = lambda: make_f64_loop(128, False)
    VARIANTS["f64k128view"] = lambda: make_f64_loop(128, True)
    VARIANTS["f64k32u3d"] = lambda: make_f64_view_loop(32, "u32_3d")
    VARIANTS["f64k32u2d"] = lambda: make_f64_view_loop(32, "u32_2d")

names = sys.argv[1:] or list(VARIANTS)
print(f"devices: {jax.devices()}  INNER={INNER}  S={S}", flush=True)
for name in names:
    f, tab, gb = VARIANTS[name]()
    timeit(name, f, tab, gb)
