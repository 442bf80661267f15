"""TPU microbench: which BELL formulation keeps gathers fused?

Times per-iteration variants of the user-side BELL gradient on the real
inst50000-5000 tables to find where XLA materializes the row gathers.
"""
import functools
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
from recsys_tpu.ops.bell import make_bell_inputs, pad_factors_for_bell, bell_gd_step

ITERS = 200

spec = load_problem("/root/repo/tests/fixtures/inst50000-5000-100-2-5.in")
data = make_bell_inputs(spec, np.float32)
state = init_factors(spec.users, spec.items, spec.features)
L0, R0 = pad_factors_for_bell(state, data, np.float32)
meta = data.meta
tables = jax.tree.map(jnp.asarray, data.tables)
alpha2 = np.float32(2.0 * spec.alpha)

print("user buckets:", [(b1 - b0, w) for (b0, b1, w) in meta.user.bounds], flush=True)
print("item buckets:", [(b1 - b0, w) for (b0, b1, w) in meta.item.bounds], flush=True)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree.map(np.asarray, out)  # force
    best = float("inf")
    for r in range(3):
        a0 = args[0] + np.float32(r * 1e-7)
        t0 = time.perf_counter()
        out = f(a0, *args[1:])
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/ITERS*1e3:.3f} ms/iter  ({best:.2f} s / {ITERS})", flush=True)
    return out


def loop(step):
    def run(L, R):
        def body(_, c):
            return step(c[0], c[1])
        return jax.lax.fori_loop(0, ITERS, body, (L, R))
    return run


# V0: current bell_gd_step
timeit("V0 full current step", loop(lambda L, R: bell_gd_step(L, R, tables, alpha2, meta)),
       jnp.asarray(L0), jnp.asarray(R0))


# V1: user side only, current 3D formulation
def user_side_3d(L, R):
    out = []
    for (b0, b1, _w), cols, vals in zip(meta.user.bounds, tables.ucols, tables.uvals):
        fo = jax.lax.slice_in_dim(L, b0, b1, axis=0)
        g = R[cols]  # (w, n, k)
        pred = jnp.sum(fo[None, :, :] * g, axis=-1)
        err = alpha2 * (vals - pred)
        out.append(jnp.sum(err[:, :, None] * g, axis=0))
    dL = jnp.concatenate(out, axis=0)
    return L.at[: meta.user.n_nz].add(dL), R


timeit("V1 user side 3D", loop(user_side_3d), jnp.asarray(L0), jnp.asarray(R0))


# V2: user side, unrolled over w (2D ops only)
def user_side_unroll(L, R):
    out = []
    for (b0, b1, w), cols, vals in zip(meta.user.bounds, tables.ucols, tables.uvals):
        fo = jax.lax.slice_in_dim(L, b0, b1, axis=0)
        dl = jnp.zeros_like(fo)
        for jw in range(w):
            r = R[cols[jw]]  # (n, k)
            pred = jnp.sum(fo * r, axis=-1)
            err = alpha2 * (vals[jw] - pred)
            dl = dl + err[:, None] * r
        out.append(dl)
    dL = jnp.concatenate(out, axis=0)
    return L.at[: meta.user.n_nz].add(dL), R


timeit("V2 user side unrolled-w", loop(user_side_unroll), jnp.asarray(L0), jnp.asarray(R0))


# V3: gathers only, unrolled (lower bound on gather cost, single use)
def user_gather_only(L, R):
    acc = jnp.zeros((1, R.shape[1]), jnp.float32)
    for (b0, b1, w), cols in zip(meta.user.bounds, tables.ucols):
        for jw in range(w):
            acc = acc + jnp.sum(R[cols[jw]], axis=0, keepdims=True)
    return L + 0.0 * acc.sum(), R


timeit("V3 gathers only (1 use each)", loop(user_gather_only), jnp.asarray(L0), jnp.asarray(R0))


# V4: item side only, 3D (the wide side: w up to 57)
def item_side_3d(L, R):
    out = []
    for (b0, b1, _w), rows, vals in zip(meta.item.bounds, tables.irows, tables.ivals):
        fo = jax.lax.slice_in_dim(R, b0, b1, axis=0)
        g = L[rows]
        pred = jnp.sum(fo[None, :, :] * g, axis=-1)
        err = alpha2 * (vals - pred)
        out.append(jnp.sum(err[:, :, None] * g, axis=0))
    dR = jnp.concatenate(out, axis=0)
    return L, R.at[: meta.item.n_nz].add(dR)


timeit("V4 item side 3D", loop(item_side_3d), jnp.asarray(L0), jnp.asarray(R0))


# V5: item side, fori over w with dynamic slices (scales to any width)
def item_side_scan(L, R):
    out = []
    for (b0, b1, w), rows, vals in zip(meta.item.bounds, tables.irows, tables.ivals):
        fo = jax.lax.slice_in_dim(R, b0, b1, axis=0)

        def body(jw, dl, rows=rows, vals=vals, fo=fo):
            rj = jax.lax.dynamic_index_in_dim(rows, jw, axis=0, keepdims=False)
            vj = jax.lax.dynamic_index_in_dim(vals, jw, axis=0, keepdims=False)
            g = L[rj]
            pred = jnp.sum(fo * g, axis=-1)
            err = alpha2 * (vj - pred)
            return dl + err[:, None] * g

        dl = jax.lax.fori_loop(0, w, body, jnp.zeros_like(fo))
        out.append(dl)
    dR = jnp.concatenate(out, axis=0)
    return L, R.at[: meta.item.n_nz].add(dR)


timeit("V5 item side fori-w", loop(item_side_scan), jnp.asarray(L0), jnp.asarray(R0))
