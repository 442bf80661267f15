"""TPU probe round 2: exact-width buckets, materialization barriers,
raw gather-rate study."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from recsys_tpu.io.parser import load_problem
from recsys_tpu.models.mf import init_factors
from recsys_tpu.ops import bell as B

ITERS = 200

spec = load_problem("/root/repo/tests/fixtures/inst50000-5000-100-2-5.in")
state = init_factors(spec.users, spec.items, spec.features)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(np.asarray, out)
    best = float("inf")
    for r in range(3):
        a0 = args[0] + np.float32(r * 1e-7)
        t0 = time.perf_counter()
        out = f(a0, *args[1:])
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/ITERS*1e3:.3f} ms/iter", flush=True)


def loop(step):
    def run(L, R):
        def body(_, c):
            return step(c[0], c[1])
        return jax.lax.fori_loop(0, ITERS, body, (L, R))
    return run


def make_step(data, barrier=False):
    meta, tables = data.meta, jax.tree.map(jnp.asarray, data.tables)
    alpha2 = jnp.float32(2.0 * spec.alpha)

    def delta_side(F_own, F_other, cols_t, vals_t, bounds):
        parts = []
        for (b0, b1, _w), cols, vals in zip(bounds, cols_t, vals_t):
            fo = jax.lax.slice_in_dim(F_own, b0, b1, axis=0)
            g = F_other[cols]
            if barrier:
                g = jax.lax.optimization_barrier(g)
            pred = jnp.sum(fo[None, :, :] * g, axis=-1)
            err = alpha2 * (vals - pred)
            parts.append(jnp.sum(err[:, :, None] * g, axis=0))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    def step(L, R):
        dL = delta_side(L, R, tables.ucols, tables.uvals, meta.user.bounds)
        dR = delta_side(R, L, tables.irows, tables.ivals, meta.item.bounds)
        L = jax.lax.dynamic_update_slice(
            L, jax.lax.slice_in_dim(L, 0, meta.user.n_nz, axis=0) + dL, (0, 0))
        R = jax.lax.dynamic_update_slice(
            R, jax.lax.slice_in_dim(R, 0, meta.item.n_nz, axis=0) + dR, (0, 0))
        return L, R

    return step


# --- pow2 buckets (current) ---
data = B.make_bell_inputs(spec, np.float32)
L0, R0 = B.pad_factors_for_bell(state, data, np.float32)
print("pow2 slots:", data.meta.slots, "vs 2*nnz:", 2 * spec.nnz, flush=True)
timeit("pow2 buckets", loop(make_step(data)), jnp.asarray(L0), jnp.asarray(R0))
timeit("pow2 + barrier", loop(make_step(data, barrier=True)), jnp.asarray(L0), jnp.asarray(R0))

# --- exact-width buckets (monkeypatched bucketing) ---
orig = B._pow2_buckets

def exact_buckets(counts_sorted, min_rows=512):
    out = []
    n = len(counts_sorted)
    start = 0
    while start < n and counts_sorted[start] > 0:
        w = int(counts_sorted[start])
        # close the bucket at the first width change beyond min_rows rows
        stop = int(np.searchsorted(-counts_sorted, -w, side="right"))
        while stop - start < min_rows and stop < n and counts_sorted[stop] > 0:
            stop = int(np.searchsorted(-counts_sorted, -int(counts_sorted[stop]), side="right"))
        out.append((start, stop, w))
        start = stop
    return out

B._pow2_buckets = exact_buckets
data2 = B.make_bell_inputs(spec, np.float32)
B._pow2_buckets = orig
L02, R02 = B.pad_factors_for_bell(state, data2, np.float32)
print("exact slots:", data2.meta.slots, "user buckets:",
      len(data2.meta.user.bounds), "item buckets:", len(data2.meta.item.bounds), flush=True)
timeit("exact buckets", loop(make_step(data2)), jnp.asarray(L02), jnp.asarray(R02))
timeit("exact + barrier", loop(make_step(data2, barrier=True)), jnp.asarray(L02), jnp.asarray(R02))

# --- raw gather-rate study ---
rng = np.random.default_rng(0)
for rows_n, tab_rows, lanes, dt in [
    (218_000, 5001, 128, np.float32),
    (218_000, 5001, 128, np.dtype(jnp.bfloat16)),
    (218_000, 5001, 256, np.float32),
    (218_000, 50001, 128, np.float32),
    (27_250, 5001, 128, np.float32),
]:
    tab = jnp.asarray(rng.standard_normal((tab_rows, lanes)).astype(np.float32)).astype(dt)
    idx = jnp.asarray(rng.integers(0, tab_rows, rows_n), jnp.int32)

    def gather_loop(tab, idx=idx):
        def body(_, acc):
            return acc + jnp.sum(tab[idx], axis=0)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((tab.shape[1],), tab.dtype))

    f = jax.jit(gather_loop)
    out = f(tab); np.asarray(out)
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        out = f(tab + jnp.asarray(np.float32(r)).astype(dt)); np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    rate = rows_n * ITERS / best / 1e6
    print(f"gather {rows_n} rows from ({tab_rows},{lanes}) {np.dtype(dt).name}: "
          f"{best/ITERS*1e3:.3f} ms/iter = {rate:.0f} M rows/s", flush=True)
