#!/usr/bin/env python3
"""Minimal Mosaic vector-gather repro + capability probe (real TPU).

Round 2 left the fused BELL gather-reduce "blocked on Mosaic
vector-gather width" with no recorded repro.  This probe answers, on
the actual attachment hardware/toolchain, whether a Pallas kernel can
gather k-rows from a VMEM-resident table:

  P1  jnp.take(table_vmem, idx_row, axis=0) inside a kernel
  P2  table_ref[idx_vector] advanced indexing inside a kernel
  P3  per-row dynamic-index loop (the scalar-loop lower bound)
  P4  P1 + the BELL err/grad math fused behind it

Each variant runs INNER iterations inside one jitted fori_loop with a
real loop-carried dependency (dispatch through the relay costs ~30 ms,
so a single execution measures only the tunnel).  Compare against the
XLA take() baseline (what ops/bell.py does today).

PROBE_INTERPRET=1 runs kernels in interpreter mode (shape validation
without burning tunnel compiles).

Usage: python scripts/probe_mosaic_gather.py [variants ...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(os.environ.get("PROBE_INTERPRET"))

N, K = 5001, 128  # R table at inst50000-5000 shape (k=100 padded to 128)
S = 176_128  # gathered rows (one BELL side), multiple of 1024
BLK = 1024  # slots per grid step
INNER = 2 if INTERPRET else 50

rng = np.random.default_rng(0)
table0 = jnp.asarray(rng.standard_normal((N, K), dtype=np.float32))
idx0 = jnp.asarray(rng.integers(0, N, S).astype(np.int32))
vals0 = jnp.asarray(rng.standard_normal(S).astype(np.float32))


def loop(step):
    """Run `step(table) -> (K,)` INNER times with a carried dependency
    (the table drifts by ~1e-20 per iter: same work, no CSE/hoisting)."""

    def body(_, carry):
        tab, acc = carry
        r = step(tab)
        return tab + 1e-20 * r[None, :], acc + r

    def fn(table):
        _, acc = jax.lax.fori_loop(0, INNER, body, (table, jnp.zeros(K, jnp.float32)))
        return acc

    return jax.jit(fn)


def timeit(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn(table0)
        s = float(np.asarray(out).sum())
        compile_s = time.perf_counter() - t0
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fn(table0)).sum())
            walls.append(time.perf_counter() - t0)
        per = min(walls) / INNER
        gb = S * K * 4 / 1e9
        print(
            f"{name}: {per * 1e3:.3f} ms/gather ({gb / per:.0f} GB/s of rows; "
            f"checksum {s:.5g}; first-call {compile_s:.1f}s)",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:300]
        print(f"{name}: FAILED — {type(e).__name__}: {msg}", flush=True)


def pcall(kernel, n_in, extra=()):
    """pallas_call wrapper: idx/vals blocks + whole table, (S,K) out."""
    specs = [pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM)] * n_in
    specs.append(pl.BlockSpec((N, K), lambda i: (0, 0), memory_space=pltpu.VMEM))

    def fn(table):
        return pl.pallas_call(
            kernel,
            grid=(S // BLK,),
            in_specs=specs,
            out_specs=pl.BlockSpec((BLK, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, K), jnp.float32),
            interpret=INTERPRET,
        )(*(extra + (table,)))

    return fn


# Baseline: plain XLA gather (+ fused reduce) — today's BELL building block.
def xla_take(tab):
    return tab[idx0].sum(axis=0)


# P1: jnp.take on a VMEM-resident table inside the kernel.
def p1_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)


# P2: advanced indexing on the loaded table value.
def p2_kernel(idx_ref, table_ref, out_ref):
    out_ref[:] = table_ref[:][idx_ref[:], :]


# P3: per-row dynamic-index loop (scalar-loop lower bound).
def p3_kernel(idx_ref, table_ref, out_ref):
    def body(s, _):
        out_ref[s, :] = table_ref[idx_ref[s], :]
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


# P4: gather + the BELL err/grad math in one kernel (fo = gathered rows'
# own-side dot partner is faked with the table's first rows here — the
# arithmetic shape is what matters).
def p4_kernel(idx_ref, vals_ref, table_ref, out_ref):
    g = jnp.take(table_ref[:], idx_ref[:], axis=0)  # (BLK, K)
    fo = table_ref[0:BLK, :] * 0.5
    pred = jnp.sum(fo * g, axis=-1)  # (BLK,)
    err = 0.001 * (vals_ref[:] - pred)
    out_ref[:] = err[:, None] * g


VARIANTS = {
    "xla": lambda: loop(xla_take),
    "p1": lambda: loop(lambda tab: pcall(p1_kernel, 1, (idx0,))(tab).sum(axis=0)),
    "p2": lambda: loop(lambda tab: pcall(p2_kernel, 1, (idx0,))(tab).sum(axis=0)),
    "p3": lambda: loop(lambda tab: pcall(p3_kernel, 1, (idx0,))(tab).sum(axis=0)),
    "p4": lambda: loop(lambda tab: pcall(p4_kernel, 2, (idx0, vals0))(tab).sum(axis=0)),
}

names = sys.argv[1:] or list(VARIANTS)
print(f"devices: {jax.devices()}  INNER={INNER}", flush=True)
for name in names:
    timeit(name, VARIANTS[name]())
