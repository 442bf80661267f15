#!/usr/bin/env python3
"""Is small-instance f64 BELL bound by per-bucket op dispatch?

inst500-500 f64 and inst1000-1000 f64 measure nearly identical
per-iteration walls (~0.31 ms) despite 2x different modeled gather
minima — suggesting a fixed per-iteration floor set by the program's op
count (one fused gather-reduce chain per bucket per side) rather than
by gathered rows.  This probe re-times the REAL f64 BELL training
program with MIN_BUCKET_ROWS raised (fewer, wider buckets; more padding
slots) to see whether trading padding for op count wins at small scale.

Usage: JAX_ENABLE_X64=1 python scripts/probe_bucket_merge.py [instance] [iters]
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

import recsys_tpu.ops.bell as bell
from recsys_tpu.io.parser import load_problem
from recsys_tpu.models.mf import init_factors

INSTANCE = sys.argv[1] if len(sys.argv) > 1 else "inst500-500-20-2-100"
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

spec = load_problem(os.path.join("tests", "fixtures", f"{INSTANCE}.in"))
print(f"devices: {jax.devices()}  {INSTANCE} k={spec.features} nnz={spec.nnz}; {ITERS} iters", flush=True)
state = init_factors(spec.users, spec.items, spec.features)

# Every config patches _degree_buckets with the SHIPPED implementations
# (bell._rows_merged_buckets / bell._guarded_buckets) at an explicit
# min_rows — a frozen local copy would silently drift from the code
# under test, and assigning bell.MIN_BUCKET_ROWS is a no-op (it was
# bound as a default parameter value at import).
def merged(min_rows):
    return lambda cs, mr=None: bell._rows_merged_buckets(cs, min_rows)


def guarded(min_rows):
    return lambda cs, mr=None: bell._guarded_buckets(cs, min_rows)


CONFIGS = [
    ("shipped", None, 0),
    ("guard64", guarded(64), 64),
    ("merge128", merged(128), 128),
    ("shipped2", None, 0),
    ("guard64b", guarded(64), 64),
]

for mode, patch, min_rows in CONFIGS:
    saved_fn = bell._degree_buckets
    if patch is not None:
        bell._degree_buckets = patch
    try:
        data = bell.make_bell_inputs(spec, dtype=np.float64)
        nb = len(data.meta.user.bounds) + len(data.meta.item.bounds)
        slots = data.meta.slots
        L0, R0 = bell.pad_factors_for_bell(state, data, np.float64)
        tables = jax.tree.map(jnp.asarray, data.tables)
        alpha2 = jnp.float64(2.0 * spec.alpha)

        def loop(L, R, tbl):
            def body(_, c):
                return bell.bell_gd_step(c[0], c[1], tbl, alpha2, data.meta)

            return jax.lax.fori_loop(0, ITERS, body, (L, R))

        fn = jax.jit(loop)
        t0 = time.perf_counter()
        Lp, _ = fn(jnp.asarray(L0), jnp.asarray(R0), tables)
        chk = float(np.asarray(Lp[:1, :1]))
        first = time.perf_counter() - t0
        walls = []
        for rep in range(2):
            L2 = jnp.asarray(L0) * (1.0 + 1e-15 * (rep + 1))
            t0 = time.perf_counter()
            La, _ = fn(L2, jnp.asarray(R0), tables)
            np.asarray(La[:1, :1])
            walls.append(time.perf_counter() - t0)
        print(
            f"{mode:10s} min_rows={min_rows:6d}: buckets={nb:3d} slots={slots:8d} "
            f"{1e3 * min(walls) / ITERS:.3f} ms/iter (first {first:.1f}s, chk {chk:.6g})",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{mode} min_rows={min_rows}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}", flush=True)
    finally:
        bell._degree_buckets = saved_fn
