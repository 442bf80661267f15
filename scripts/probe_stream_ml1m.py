#!/usr/bin/env python3
"""A/B the grid-streamed kernel vs the in-kernel-fori resident kernel at
gen-ML1M shape on real TPU (the round-2 fori_loop spill guard measured
4.8 ms/iter there — ~4x over the kernel's own roofline).

Usage: python scripts/probe_stream_ml1m.py [iters]
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

from recsys_tpu.io.parser import load_problem
from recsys_tpu.io.generator import GEN_SPECS, materialize_gen_fixture
from recsys_tpu.ops import pallas_dense as pd

iters = int(sys.argv[1]) if len(sys.argv) > 1 else 300

fix_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures")
path = os.path.join(fix_dir, "gen-instML1M.in")
if not os.path.exists(path):
    materialize_gen_fixture("gen-instML1M", fix_dir)
spec = load_problem(path)

strip = pd.strip_for(spec)
Lt, Rt, (U, I, K) = pd.pad_factors_for_pallas(spec, strip=strip)
print(f"shape U={U} I={I} K={K} strip={strip} n_strips={I // strip}", flush=True)
A16 = pd.device_dense_AT(spec, U, I, dtype=jnp.bfloat16)

A8 = pd.device_dense_AT(spec, U, I, dtype=jnp.int8)

variants = [
    ("stream f32-highest int8A", pd.stream_train, "highest", A8),
    ("stream f32-highest bf16A", pd.stream_train, "highest", A16),
    ("stream bf16-1pass  int8A", pd.stream_train, "default", A8),
    ("resident f32-highest(fori)", pd.resident_train, "highest", A16),
    ("resident bf16-1pass (fori)", pd.resident_train, "default", A16),
]
for name, fn, precision, A in variants:
    walls = []
    for rep in range(3):
        L0 = jnp.asarray(Lt) * (1.0 + 1e-7 * rep)
        R0 = jnp.asarray(Rt)
        t0 = time.perf_counter()
        L1, R1 = fn(L0, R0, A, iters=iters, alpha2=2.0 * spec.alpha,
                    strip=strip, precision=precision)
        s = float(np.asarray(L1[:1, :1])[0, 0])
        walls.append(time.perf_counter() - t0)
    print(
        f"{name}: min {min(walls):.4f}s / {iters} iters = "
        f"{1e3 * min(walls) / iters:.4f} ms/iter (checksum {s:.6g}, "
        f"all {['%.3f' % w for w in walls]})", flush=True,
    )

# Tiled two-pass baseline (lane-major layout, the pre-stream ML1M path).
Ltm, Rtm, (Ut, It, Kt) = pd.pad_factors_lane_major(spec, strip=512)
Af = pd.device_dense_A(spec, Ut, It, dtype=jnp.float32)
for name, precision in [("tiled f32-highest", "highest"), ("tiled 1-pass", "default")]:
    walls = []
    for rep in range(3):
        L0 = jnp.asarray(Ltm) * (1.0 + 1e-7 * rep)
        R0 = jnp.asarray(Rtm)
        t0 = time.perf_counter()
        L1, R1 = pd.tiled_train(L0, R0, Af, 2.0 * spec.alpha, iters=iters,
                                precision=precision)
        s = float(np.asarray(L1[:1, :1])[0, 0])
        walls.append(time.perf_counter() - t0)
    print(
        f"{name}: min {min(walls):.4f}s / {iters} iters = "
        f"{1e3 * min(walls) / iters:.4f} ms/iter (checksum {s:.6g}, "
        f"all {['%.3f' % w for w in walls]})", flush=True,
    )
