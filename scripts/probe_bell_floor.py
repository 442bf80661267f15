#!/usr/bin/env python3
"""Measure BELL per-iteration time vs the gather-engine floor.

probe_gather_rate.py established the XLA row-gather engine runs at a
fixed ~208 M rows/s for rows up to 512 B (width/dtype/pattern
independent).  BELL's per-iteration cost should therefore be
~(user_slots + item_slots) / 208e6 s.  This prints, per instance and
dtype: slots, measured ms/iter, implied rows/s, and % of the engine
rate — the honest op-roofline for the sparse path.

Usage: python scripts/probe_bell_floor.py [fixture ...] [--dtype f32,f64] [--iters N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = {a.split("=")[0]: a.split("=")[1] for a in sys.argv[1:] if a.startswith("--") and "=" in a}
fixtures = args or [
    "tests/fixtures/inst50000-5000-100-2-5.in",
    "tests/fixtures/gen-inst1000-80000-20-10-1000.in",
]
dtypes = opts.get("--dtype", "f32").split(",")
iters = int(opts.get("--iters", "200"))

DT = {"f32": np.float32, "f64": np.float64}

if "f64" in dtypes:
    import jax

    jax.config.update("jax_enable_x64", True)

import jax
import jax.numpy as jnp

from recsys_tpu.engine.trainer import _train_bell
from recsys_tpu.io.parser import load_problem
from recsys_tpu.models.mf import init_factors
from recsys_tpu.ops import bell

GATHER_ROWS_PER_S = 208e6

print(f"devices: {jax.devices()}", flush=True)
for fx in fixtures:
    spec = load_problem(fx)
    state = init_factors(spec.users, spec.items, spec.features)
    for dt_name in dtypes:
        dt = DT[dt_name]
        data = bell.make_bell_inputs(spec, dtype=dt)
        Lp, Rp = bell.pad_factors_for_bell(state, data, dt)
        tables = jax.tree.map(jnp.asarray, data.tables)
        alpha2 = dt(2.0 * spec.alpha)
        m = data.meta
        u_slots = sum(w * (b1 - b0) for (b0, b1, w) in m.user.bounds)
        i_slots = sum(w * (b1 - b0) for (b0, b1, w) in m.item.bounds)
        rows = u_slots + i_slots
        walls = []
        for rep in range(3):
            L0 = jnp.asarray(Lp) * (1.0 + 1e-7 * rep)
            R0 = jnp.asarray(Rp)
            t0 = time.perf_counter()
            L1, R1 = _train_bell(L0, R0, tables, alpha2, iters, m)
            float(np.asarray(L1[:1, :1])[0, 0])
            walls.append(time.perf_counter() - t0)
        per = min(walls) / iters
        floor = rows / GATHER_ROWS_PER_S
        print(
            f"{os.path.basename(fx)} {dt_name}: slots u={u_slots} i={i_slots} "
            f"(ratio {rows / (2 * spec.nnz):.3f}) | {per * 1e3:.3f} ms/iter, "
            f"implied {rows / per / 1e6:.0f} M rows/s = {100 * floor / per:.0f}% of engine rate "
            f"(floor {floor * 1e3:.3f} ms)",
            flush=True,
        )
