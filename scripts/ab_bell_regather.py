#!/usr/bin/env python3
"""A/B the BELL double-consumption fix on real TPU.

Times _train_bell per-iteration on a fixture with REGATHER_FOR_GRADIENT
on vs off (same numerics, different HLO: one staged lane-padded gather
temp vs two barrier-separated gathers that can fuse into their
reductions).  Timing forces a device->host transfer and perturbs an
input between repeats (block_until_ready is unreliable through this
attachment; see CLAUDE.md).

Usage: python scripts/ab_bell_regather.py [fixture.in] [iters]
"""

import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)) + "/..")

import numpy as np

from recsys_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import jax

from recsys_tpu.io.parser import load_problem
from recsys_tpu.ops import bell

fixture = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures/inst50000-5000-100-2-5.in"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 300

spec = load_problem(fixture)
data = bell.make_bell_inputs(spec, dtype=np.float32)
from recsys_tpu.models.mf import init_factors

state = init_factors(spec.users, spec.items, spec.features)
Lp, Rp = bell.pad_factors_for_bell(state, data, np.float32)
tables = jax.tree.map(jnp.asarray, data.tables)
alpha2 = jnp.float32(2.0 * spec.alpha)

from recsys_tpu.engine.trainer import _train_bell

for flag in (False, True):
    bell.REGATHER_FOR_GRADIENT = flag
    # distinct iters per flag -> distinct cache key (module flag is not
    # part of the jit key; donate_argnums also forbids reuse of inputs)
    it = iters + (1 if flag else 0)
    walls = []
    for rep in range(3):
        L0 = jnp.asarray(Lp) * (1.0 + 1e-7 * rep)  # defeat memoization
        R0 = jnp.asarray(Rp)
        t0 = time.perf_counter()
        L1, R1 = _train_bell(L0, R0, tables, alpha2, it, data.meta)
        s = float(np.asarray(L1[:1, :1])[0, 0])  # force completion
        walls.append(time.perf_counter() - t0)
    print(
        f"regather={flag}: min wall {min(walls):.4f}s over {it} iters "
        f"= {1e3 * min(walls) / it:.4f} ms/iter (checksum {s:.6g}, all {['%.3f' % w for w in walls]})"
    )
