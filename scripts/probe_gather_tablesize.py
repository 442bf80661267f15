#!/usr/bin/env python3
"""Row-gather engine rate vs SOURCE TABLE size.

probe_gather_rate.py mapped the engine's rate against row width, dtype,
index order and duplication with a fixed 5001-row source table and found
~208-260 M f32 rows/s / ~120 M f64 rows/s.  Two committed bench rows
exceeded 100% of a roofline built on those numbers — and both gather one
side from a table far smaller than that probe's (gen-inst1000-80000's
i-side reads a 1001-row L table; inst600-10000-f64's i-side a 601-row
L table).  Hypothesis: gathers whose source table fits in an on-chip
cache/VMEM-staging window run materially faster than the HBM-resident
engine rate, so a per-side roofline must price the rate as a function
of table size.

This probe fixes the gathered-row count (S = 176,128, the shape every
earlier probe used) and the row width (k = 32 f32 / k = 32 f64 under
x64), and sweeps the table's row count N.  Indices are uniform over N.

Usage: [JAX_ENABLE_X64=1] python scripts/probe_gather_tablesize.py [Ns...]
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

S = 176_128
K = int(os.environ.get("PROBE_K", "32"))
INNER = 50
X64 = bool(os.environ.get("JAX_ENABLE_X64"))
DTYPE = jnp.float64 if X64 else jnp.float32

rng = np.random.default_rng(0)


IDX_MODE = os.environ.get("PROBE_IDX", "uniform")  # uniform | sorted | dup64


def _indices(n_rows: int) -> np.ndarray:
    u = rng.integers(0, n_rows, S).astype(np.int32)
    if IDX_MODE == "sorted":
        return np.sort(u)  # BELL's u-side: ascending within row runs
    if IDX_MODE == "dup64":
        return (u % max(n_rows // 64, 1)).astype(np.int32)  # hub-heavy
    return u


def make_loop(n_rows: int):
    table = jnp.asarray(rng.standard_normal((n_rows, K)), dtype=DTYPE)
    idx = jnp.asarray(_indices(n_rows))

    def body(_, carry):
        tab, acc = carry
        r = tab[idx].sum(axis=0)
        return tab + (1e-30 * r[None, :]).astype(DTYPE), acc + r

    @jax.jit
    def fn(table):
        _, acc = jax.lax.fori_loop(
            0, INNER, body, (table, jnp.zeros(K, DTYPE))
        )
        return acc

    return fn, table


def main():
    ns = [int(x) for x in sys.argv[1:]] or [
        256, 1024, 4096, 16384, 65536, 262144, 1048576
    ]
    print(f"devices: {jax.devices()}  S={S} K={K} dtype={np.dtype(DTYPE)} INNER={INNER}", flush=True)
    for n in ns:
        fn, tab = make_loop(n)
        try:
            t0 = time.perf_counter()
            s = float(np.asarray(fn(tab)).sum())
            first = time.perf_counter() - t0
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(fn(tab)).sum())
                walls.append(time.perf_counter() - t0)
            per = min(walls) / INNER
            tb = n * K * jnp.dtype(DTYPE).itemsize
            print(
                f"N={n:>8d} (table {tb / 1e6:8.3f} MB): {per * 1e3:.3f} ms "
                f"-> {S / per / 1e6:6.0f} M rows/s  (first {first:.1f}s, sum {s:.4g})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"N={n}: FAILED — {type(e).__name__}: {str(e).splitlines()[0][:200]}", flush=True)


if __name__ == "__main__":
    main()
